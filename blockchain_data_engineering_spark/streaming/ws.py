"""Dependency-free RFC-6455 websocket transport (SURVEY §2.1 S1).

The reference's streamer connects to Ogmios over a websocket
(src/cardano_streamer/main.py:29-32, ``ws://host:1337``); each JSON-RPC
message rides in one text frame. This module is the minimal client AND
server framing needed to speak that protocol with the Python stdlib
only — no ``websockets``/``websocket-client`` package in this
container, and none needed: chain-sync uses text frames, ping/pong
keepalive, and close, nothing more.

Scope (deliberate): no permessage-deflate, no subprotocol negotiation,
no wss:// (TLS would wrap the socket before the handshake — pass an
``ssl``-wrapped socket in and everything here works unchanged). Client
frames are masked as the RFC requires; server frames are not.
Fragmented messages (continuation frames) are reassembled; ping is
answered with pong transparently inside ``recv_text``.
"""

from __future__ import annotations

import base64
import hashlib
import os
import secrets
import socket
import struct

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"  # RFC 6455 §1.3

_OP_CONT = 0x0
_OP_TEXT = 0x1
_OP_BINARY = 0x2
_OP_CLOSE = 0x8
_OP_PING = 0x9
_OP_PONG = 0xA

# Upper bound on a declared frame payload AND on a reassembled
# fragmented message. Without it a buggy/malicious peer could declare a
# 2^63-1-byte frame and _read_exact would try to buffer it all before
# any validity check. Ogmios chain-sync messages are block documents —
# multi-KB, a few MB at the pathological tail — so 64 MB is generous.
MAX_MESSAGE_BYTES = 64 * 1024 * 1024


class WsProtocolError(ConnectionError):
    """RFC 6455 violation (oversized frame, BINARY data, interleaved
    fragments). Unlike a plain transport drop — which ``recv_text``
    reports as clean end-of-stream — these re-raise to the caller: a
    peer speaking the protocol wrong must fail the stream loudly, not
    truncate it silently."""


def _xor_mask(data: bytes, key: bytes) -> bytes:
    """XOR ``data`` with the repeating 4-byte mask ``key`` via one
    big-int XOR (C-level) — frames carry multi-KB block documents, so a
    per-byte Python loop here would dominate the transport cost."""
    if not data:
        return data
    reps = -(-len(data) // 4)
    full = (key * reps)[: len(data)]
    return (int.from_bytes(data, "big") ^ int.from_bytes(full, "big")).to_bytes(
        len(data), "big"
    )


def accept_key(client_key: str) -> str:
    """``Sec-WebSocket-Accept`` for a client's ``Sec-WebSocket-Key``
    (RFC 6455 §4.2.2 step 5.4): base64(sha1(key + GUID))."""
    digest = hashlib.sha1((client_key + _WS_GUID).encode("ascii")).digest()
    return base64.b64encode(digest).decode("ascii")


class WebSocketConnection:
    """Framing layer over a connected socket. ``mask=True`` for the
    client side (the RFC rejects unmasked client frames), ``mask=False``
    for the server side."""

    def __init__(
        self,
        sock: socket.socket,
        mask: bool,
        max_message_bytes: int = MAX_MESSAGE_BYTES,
    ):
        self._sock = sock
        self._mask = mask
        self._max_message_bytes = max_message_bytes
        self._rfile = sock.makefile("rb")
        self.closed = False

    # -- receive ----------------------------------------------------------

    def _read_exact(self, n: int) -> bytes:
        data = self._rfile.read(n)
        if data is None or len(data) < n:
            raise ConnectionError("websocket: peer closed mid-frame")
        return data

    def _read_frame(self) -> tuple[int, bool, bytes]:
        """One raw frame → (opcode, fin, payload)."""
        b1, b2 = struct.unpack("!BB", self._read_exact(2))
        fin = bool(b1 & 0x80)
        opcode = b1 & 0x0F
        masked = bool(b2 & 0x80)
        length = b2 & 0x7F
        if length == 126:
            (length,) = struct.unpack("!H", self._read_exact(2))
        elif length == 127:
            (length,) = struct.unpack("!Q", self._read_exact(8))
        if length > self._max_message_bytes:
            # reject BEFORE buffering — mirrors the oversized-head guard
            self.closed = True
            raise WsProtocolError(
                f"websocket: declared frame length {length} exceeds cap "
                f"{self._max_message_bytes}"
            )
        if masked:
            key = self._read_exact(4)
            payload = _xor_mask(self._read_exact(length), key)
        else:
            payload = self._read_exact(length)
        return opcode, fin, payload

    def recv_text(self) -> str | None:
        """Next complete text message (continuation frames reassembled,
        pings answered in place); ``None`` once the peer sends close or
        the connection drops."""
        if self.closed:
            return None
        buf = b""
        in_message = False
        while True:
            try:
                opcode, fin, payload = self._read_frame()
            except WsProtocolError:
                raise
            except (ConnectionError, OSError, ValueError):
                self.closed = True
                return None
            if opcode == _OP_PING:
                self._send_frame(_OP_PONG, payload)
                continue
            if opcode == _OP_PONG:
                continue
            if opcode == _OP_CLOSE:
                # echo close (RFC §5.5.1) then report end-of-stream
                if not self.closed:
                    try:
                        self._send_frame(_OP_CLOSE, payload[:2])
                    except OSError:
                        pass
                    self.closed = True
                return None
            if opcode == _OP_BINARY:
                # chain-sync is a text protocol; decoding arbitrary
                # bytes as UTF-8 would corrupt, not fail (RFC §5.6)
                self.closed = True
                raise WsProtocolError("websocket: unexpected BINARY frame")
            if opcode == _OP_TEXT:
                if in_message:
                    # new data frame inside a fragmented message is a
                    # protocol error (RFC §5.4), not a fresh start
                    self.closed = True
                    raise WsProtocolError(
                        "websocket: TEXT frame interleaved mid-fragment"
                    )
                buf = payload
                in_message = True
            elif opcode == _OP_CONT and in_message:
                buf += payload
                if len(buf) > self._max_message_bytes:
                    # per-frame cap alone wouldn't bound the reassembly
                    self.closed = True
                    raise WsProtocolError(
                        "websocket: fragmented message exceeds cap"
                    )
            else:
                raise ValueError(f"websocket: unexpected opcode {opcode:#x}")
            if fin and in_message:
                return buf.decode("utf-8")

    # -- send -------------------------------------------------------------

    def _send_frame(self, opcode: int, payload: bytes) -> None:
        header = bytearray([0x80 | opcode])  # FIN set: one frame/message
        n = len(payload)
        mask_bit = 0x80 if self._mask else 0x00
        if n < 126:
            header.append(mask_bit | n)
        elif n < (1 << 16):
            header.append(mask_bit | 126)
            header += struct.pack("!H", n)
        else:
            header.append(mask_bit | 127)
            header += struct.pack("!Q", n)
        if self._mask:
            key = os.urandom(4)
            header += key
            payload = _xor_mask(payload, key)
        self._sock.sendall(bytes(header) + payload)

    def send_text(self, text: str) -> None:
        self._send_frame(_OP_TEXT, text.encode("utf-8"))

    def close(self) -> None:
        if not self.closed:
            try:
                self._send_frame(_OP_CLOSE, struct.pack("!H", 1000))
            except OSError:
                pass
            self.closed = True
        try:
            self._rfile.close()
        except OSError:
            pass


def client_handshake(
    sock: socket.socket, host: str, port: int, path: str = "/"
) -> WebSocketConnection:
    """HTTP Upgrade handshake, client side (RFC 6455 §4.1). Raises
    ``ConnectionError`` unless the server answers 101 with the correct
    ``Sec-WebSocket-Accept`` digest."""
    key = base64.b64encode(secrets.token_bytes(16)).decode("ascii")
    request = (
        f"GET {path} HTTP/1.1\r\n"
        f"Host: {host}:{port}\r\n"
        "Upgrade: websocket\r\n"
        "Connection: Upgrade\r\n"
        f"Sec-WebSocket-Key: {key}\r\n"
        "Sec-WebSocket-Version: 13\r\n"
        "\r\n"
    )
    sock.sendall(request.encode("ascii"))
    status, headers = _read_http_head(sock)
    if " 101 " not in status and not status.startswith("HTTP/1.1 101"):
        raise ConnectionError(f"websocket handshake rejected: {status!r}")
    got = headers.get("sec-websocket-accept", "")
    if got != accept_key(key):
        raise ConnectionError("websocket handshake: bad Sec-WebSocket-Accept")
    return WebSocketConnection(sock, mask=True)


def server_handshake(conn: socket.socket) -> WebSocketConnection:
    """HTTP Upgrade handshake, server side. Answers 101 and returns the
    framing wrapper; raises ``ConnectionError`` on a non-websocket
    request."""
    status, headers = _read_http_head(conn)
    key = headers.get("sec-websocket-key")
    if not status.startswith("GET ") or not key:
        raise ConnectionError(f"not a websocket upgrade: {status!r}")
    response = (
        "HTTP/1.1 101 Switching Protocols\r\n"
        "Upgrade: websocket\r\n"
        "Connection: Upgrade\r\n"
        f"Sec-WebSocket-Accept: {accept_key(key)}\r\n"
        "\r\n"
    )
    conn.sendall(response.encode("ascii"))
    return WebSocketConnection(conn, mask=False)


def _read_http_head(sock: socket.socket) -> tuple[str, dict[str, str]]:
    """Read one HTTP request/response head off the socket (byte-wise up
    to the blank line, so no framed bytes after the head are consumed)."""
    data = b""
    while b"\r\n\r\n" not in data:
        chunk = sock.recv(1)
        if not chunk:
            raise ConnectionError("websocket handshake: peer closed")
        data += chunk
        if len(data) > 65536:
            raise ConnectionError("websocket handshake: oversized head")
    head = data.split(b"\r\n\r\n", 1)[0].decode("latin-1")
    lines = head.split("\r\n")
    headers = {}
    for line in lines[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    return lines[0], headers

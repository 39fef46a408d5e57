"""Live chain-sync source adapter (SURVEY §2.1 S1).

The reference's streamer (src/cardano_streamer/main.py:34-52) is an
Ogmios chain-sync client over a websocket (main.py:29-32,
``ws://host:1337``): ``find_intersection([start_point])`` once, then a
``next_block`` loop; every ``forward`` roll is serialized to one NDJSON
line and pushed to whatever Spark's socket source has connected.

:class:`ChainSyncProducer` is that client rebuilt for the engine's
canonical source path: it speaks the same two-verb protocol
(``findIntersection`` / ``nextBlock``, Ogmios v6 method names as
JSON-RPC 2.0) and lands each forward block as an NDJSON line in a
directory that :func:`streaming.sources.ndjson_file_stream` tails —
replayable, checkpoint-friendly, and partitioned, unlike the
reference's raw socket push (which remains available via
``sources.socket_stream`` as the dev tap).

Transports: ``transport="ws"`` speaks RFC-6455 websocket framing (one
JSON-RPC message per text frame — what real Ogmios serves; client
framing is the dependency-free :mod:`streaming.ws`), and
``transport="line"`` speaks line-delimited JSON-RPC over bare TCP (the
dev/test shortcut). :class:`MockChainSyncNode` is the test double for
the Ogmios node itself and serves both transports, so the producer is
integration-tested end-to-end over genuine ws frames.
"""

from __future__ import annotations

import json
import socket
import threading

from blockchain_data_engineering_spark.streaming import ws as _ws


class MockChainSyncNode:
    """Ogmios-shaped chain-sync node (``transport="line"`` or ``"ws"``).

    Serves ``blocks`` (already-serialized NDJSON block documents) as
    forward rolls after an intersection handshake. One client at a
    time, bounded, deterministic — exactly what an integration test
    needs.
    """

    def __init__(
        self,
        blocks: list[str],
        host: str = "127.0.0.1",
        transport: str = "line",
        max_conns: int = 1,
        reorg: dict | None = None,
    ):
        if transport not in ("line", "ws"):
            raise ValueError(f"unknown transport {transport!r}")
        self._blocks = blocks
        # scripted reorg: after serving reorg["after"] forward rolls,
        # emit ONE backward roll to reorg["point"] ({"slot", "id"} —
        # Ogmios v6 RollBackward shape), then serve reorg["blocks"]
        # (the replacement fork) forward. Every conversation replays
        # the same scripted sequence, so offset replay is exact.
        self._rolls: list[dict] = [
            {"direction": "forward", "block": b} for b in blocks
        ]
        if reorg is not None:
            self._rolls = (
                self._rolls[: reorg["after"]]
                + [{"direction": "backward", "point": reorg["point"]}]
                + [
                    {"direction": "forward", "block": b}
                    for b in reorg["blocks"]
                ]
            )
        self.transport = transport
        # sequential client conversations to serve before closing —
        # each restarts at genesis (the data-source readers skip to
        # their offset; a real Ogmios resumes at the intersection point)
        self.max_conns = max_conns
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, 0))
        self._sock.listen(1)
        self.host, self.port = self._sock.getsockname()
        self._thread: threading.Thread | None = None

    def start(self) -> "MockChainSyncNode":
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()
        return self

    def _respond(self, req: dict, cursor: int) -> tuple[dict, int]:
        """The protocol state machine, transport-independent."""
        method = req.get("method")
        if method == "findIntersection":
            points = req.get("params", {}).get("points", [])
            resp = {
                "jsonrpc": "2.0",
                "method": method,
                "result": {"intersection": points[0] if points else "origin"},
                "id": req.get("id"),
            }
        elif method == "nextBlock":
            if cursor < len(self._rolls):
                resp = {
                    "jsonrpc": "2.0",
                    "method": method,
                    "result": dict(self._rolls[cursor]),
                    "id": req.get("id"),
                }
                cursor += 1
            else:
                resp = {
                    "jsonrpc": "2.0",
                    "method": method,
                    "result": {"direction": "tip"},
                    "id": req.get("id"),
                }
        else:
            resp = {
                "jsonrpc": "2.0",
                "error": {"code": -32601, "message": f"unknown {method}"},
                "id": req.get("id"),
            }
        return resp, cursor

    def _serve(self) -> None:
        for _ in range(self.max_conns):
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            cursor = 0
            with conn:
                if self.transport == "ws":
                    try:
                        wsc = _ws.server_handshake(conn)
                    except ConnectionError:
                        continue
                    while True:
                        msg = wsc.recv_text()
                        if msg is None:
                            break
                        resp, cursor = self._respond(json.loads(msg), cursor)
                        wsc.send_text(json.dumps(resp))
                else:
                    fh = conn.makefile("rb")
                    while True:
                        line = fh.readline()
                        if not line:
                            break
                        resp, cursor = self._respond(json.loads(line), cursor)
                        conn.sendall((json.dumps(resp) + "\n").encode())
        self._sock.close()

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass


class ChainSyncClient:
    """One chain-sync conversation: connect (ws or line transport),
    ``findIntersection`` once, then ``next_block()`` until tip. The
    shared protocol core under :class:`ChainSyncProducer` (NDJSON
    landing) and the registered ``chain_sync`` Spark data source
    (:mod:`streaming.datasource`)."""

    def __init__(
        self,
        host: str,
        port: int,
        transport: str = "line",
        start_point: str = "origin",
    ):
        if transport not in ("line", "ws"):
            raise ValueError(f"unknown transport {transport!r}")
        self.host, self.port = host, port
        self.transport = transport
        self.start_point = start_point
        self._id = 0
        self._sock: socket.socket | None = None
        self._send = None
        self._recv = None

    def connect(self) -> "ChainSyncClient":
        sock = socket.create_connection((self.host, self.port))
        self._sock = sock
        if self.transport == "ws":
            wsc = _ws.client_handshake(sock, self.host, self.port)
            self._send, self._recv = wsc.send_text, wsc.recv_text
            self._wsc = wsc
        else:
            fh_in = sock.makefile("rb")
            fh_out = sock.makefile("wb")

            def send(s: str) -> None:
                fh_out.write((s + "\n").encode())
                fh_out.flush()

            def recv() -> str | None:
                line = fh_in.readline()
                return line.decode() if line else None

            self._send, self._recv = send, recv
        self._rpc("findIntersection", {"points": [self.start_point]})
        return self

    def _rpc(self, method: str, params: dict | None = None) -> dict:
        self._id += 1
        req = {"jsonrpc": "2.0", "method": method, "id": self._id}
        if params:
            req["params"] = params
        self._send(json.dumps(req))
        msg = self._recv()
        if msg is None:
            raise ConnectionError("chain-sync peer closed mid-conversation")
        return json.loads(msg)

    def next_roll(self) -> tuple[str, str | dict | None]:
        """The next chain-sync roll, typed:

        - ``("forward", block_document)`` — the next block,
        - ``("backward", point)`` — a reorg: every block already rolled
          forward with slot > ``point["slot"]`` is orphaned (Ogmios v6
          RollBackward),
        - ``("tip", None)`` — caught up.
        """
        resp = self._rpc("nextBlock")
        result = resp.get("result", {})
        direction = result.get("direction")
        if direction == "forward":
            return "forward", result["block"]
        if direction == "backward":
            return "backward", result.get("point")
        return "tip", None

    def next_block(self) -> str | None:
        """Rollback-blind convenience: the next ``forward`` block
        document, or ``None`` at tip OR on a backward roll (mirrors the
        reference streamer, which only handles forward rolls —
        src/cardano_streamer/main.py:42-47). Reorg-aware consumers use
        :meth:`next_roll`."""
        direction, payload = self.next_roll()
        if direction == "forward":
            return payload
        return None

    def close(self) -> None:
        if self.transport == "ws" and getattr(self, "_wsc", None) is not None:
            self._wsc.close()
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass
            self._sock = None


class ChainSyncProducer:
    """The reference streamer's find_intersection → next_block loop
    (src/cardano_streamer/main.py:40-52), emitting NDJSON files.

    ``rotate_every`` blocks per file: the file stream source picks up
    each closed file as (part of) a micro-batch, so rotation size is
    the live path's batching knob. ``transport="ws"`` matches real
    Ogmios (main.py:29-32); ``"line"`` is the bare-TCP dev variant.
    """

    def __init__(
        self,
        host: str,
        port: int,
        out_dir: str,
        rotate_every: int = 10,
        transport: str = "line",
        emit_rollbacks: bool = False,
    ):
        if transport not in ("line", "ws"):
            raise ValueError(f"unknown transport {transport!r}")
        self.host, self.port, self.out_dir = host, port, out_dir
        self.rotate_every = rotate_every
        self.transport = transport
        # emit_rollbacks=True: on a backward roll, flush pending blocks
        # and land a rollback MARKER line (streaming.rollback format)
        # as its OWN file, then keep syncing the replacement fork. The
        # file stream source tracks files BY NAME and never re-reads
        # them, so landed orphan blocks cannot be retracted here — the
        # marker tells the keyed sinks downstream to undo them
        # (streaming.rollback.rollback_aware_upsert). False preserves
        # the reference's forward-only behavior: stop at the first
        # backward roll (src/cardano_streamer/main.py:42-47).
        self.emit_rollbacks = emit_rollbacks

    def run(
        self,
        start_point: str = "origin",
        max_blocks: int | None = None,
        resume: bool = False,
    ) -> int:
        """Sync until tip (or ``max_blocks`` NEW blocks); returns
        blocks written this run.

        ``resume=True`` makes a producer RESTART continue where the
        last run stopped instead of re-landing the chain from the
        start: every landed line is one roll, so the landing dir
        itself records the protocol position — skip that many rolls
        after connecting. Correct against any upstream that replays
        the same roll sequence per conversation (the mock node, replay
        fixtures); against a live Ogmios node prefer passing the last
        landed block's ``(slot, id)`` as ``start_point`` (the
        protocol's own ``find_intersection``) — cheaper than
        re-streaming, and exact across real forks.
        """
        import os

        os.makedirs(self.out_dir, exist_ok=True)
        n = 0
        pending: list[str] = []
        # resume numbering after any previously landed files: restarting
        # at 0 would overwrite part-00000 onward — and Spark's file
        # stream source tracks seen files BY NAME, so overwritten files
        # are never re-read and the new blocks silently vanish
        existing = [
            f
            for f in os.listdir(self.out_dir)
            if f.startswith("part-") and f.endswith(".ndjson")
        ]
        file_idx = (
            max(int(f[5:10]) for f in existing) + 1 if existing else 0
        )
        landed_rolls = 0
        if resume:
            for fname in existing:
                with open(os.path.join(self.out_dir, fname)) as fh:
                    landed_rolls += sum(1 for ln in fh if ln.strip())

        def flush() -> None:
            nonlocal pending, file_idx
            if not pending:
                return
            # write-then-rename so the tailing file stream never reads
            # a half-written file
            tmp = os.path.join(self.out_dir, f".part-{file_idx:05d}.tmp")
            final = os.path.join(self.out_dir, f"part-{file_idx:05d}.ndjson")
            with open(tmp, "w") as f:
                f.write("\n".join(pending) + "\n")
            os.rename(tmp, final)
            pending = []
            file_idx += 1

        from blockchain_data_engineering_spark.streaming.rollback import (
            rollback_marker_line,
        )

        client = ChainSyncClient(
            self.host, self.port, self.transport, start_point
        ).connect()
        try:
            skipped = 0
            while skipped < landed_rolls:
                direction, _ = client.next_roll()
                if direction == "tip":
                    break  # upstream shorter than the landing dir
                skipped += 1
            while max_blocks is None or n < max_blocks:
                direction, payload = client.next_roll()
                if direction == "tip":
                    break
                if direction == "backward":
                    if not self.emit_rollbacks:
                        break  # reference behavior: forward rolls only
                    # the marker must postdate every already-landed
                    # orphan and predate every fork block — flush, then
                    # give the marker its own file index
                    flush()
                    pending.append(rollback_marker_line(payload))
                    flush()
                    continue
                pending.append(payload)
                n += 1
                if len(pending) >= self.rotate_every:
                    flush()
        finally:
            client.close()
        flush()
        return n

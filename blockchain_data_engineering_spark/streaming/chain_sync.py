"""Live chain-sync source adapter (SURVEY §2.1 S1).

The reference's streamer (src/cardano_streamer/main.py:34-52) is an
Ogmios chain-sync client: ``find_intersection([start_point])`` once,
then a ``next_block`` loop; every ``forward`` roll is serialized to one
NDJSON line and pushed to whatever Spark's socket source has connected.

:class:`ChainSyncProducer` is that client rebuilt for the engine's
canonical source path: it speaks the same two-verb protocol
(``findIntersection`` / ``nextBlock``, Ogmios v6 method names over
line-delimited JSON-RPC 2.0) and lands each forward block as an NDJSON
line in a directory that :func:`streaming.sources.ndjson_file_stream`
tails — replayable, checkpoint-friendly, and partitioned, unlike the
reference's raw socket push (which remains available via
``sources.socket_stream`` as the dev tap).

:class:`MockChainSyncNode` is the test double for the Ogmios node
itself: a TCP server that answers ``findIntersection`` with the
requested point and streams a fixed block list as ``forward`` rolls,
then reports ``tip``. The websocket framing of real Ogmios is the only
thing mocked away (no websocket client in this environment); the
request/response state machine is the same, so swapping in a real
endpoint changes only the transport layer of
:meth:`ChainSyncProducer._rpc`.
"""

from __future__ import annotations

import json
import socket
import threading


class MockChainSyncNode:
    """Ogmios-shaped chain-sync node over line-delimited JSON-RPC.

    Serves ``blocks`` (already-serialized NDJSON block documents) as
    forward rolls after an intersection handshake. One client at a
    time, bounded, deterministic — exactly what an integration test
    needs.
    """

    def __init__(self, blocks: list[str], host: str = "127.0.0.1"):
        self._blocks = blocks
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

    def _serve(self) -> None:
        try:
            conn, _ = self._sock.accept()
        except OSError:
            return
        cursor = 0
        buf = b""
        with conn:
            fh = conn.makefile("rb")
            while True:
                line = fh.readline()
                if not line:
                    break
                req = json.loads(line)
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
                    if cursor < len(self._blocks):
                        resp = {
                            "jsonrpc": "2.0",
                            "method": method,
                            "result": {
                                "direction": "forward",
                                "block": self._blocks[cursor],
                            },
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
                conn.sendall((json.dumps(resp) + "\n").encode())
        self._sock.close()

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass


class ChainSyncProducer:
    """The reference streamer's find_intersection → next_block loop
    (src/cardano_streamer/main.py:40-52), emitting NDJSON files.

    ``rotate_every`` blocks per file: the file stream source picks up
    each closed file as (part of) a micro-batch, so rotation size is
    the live path's batching knob.
    """

    def __init__(self, host: str, port: int, out_dir: str, rotate_every: int = 10):
        self.host, self.port, self.out_dir = host, port, out_dir
        self.rotate_every = rotate_every
        self._id = 0

    def _rpc(self, fh_in, fh_out, method: str, params: dict | None = None) -> dict:
        self._id += 1
        req = {"jsonrpc": "2.0", "method": method, "id": self._id}
        if params:
            req["params"] = params
        fh_out.write((json.dumps(req) + "\n").encode())
        fh_out.flush()
        return json.loads(fh_in.readline())

    def run(self, start_point: str = "origin", max_blocks: int | None = None) -> int:
        """Sync until tip (or ``max_blocks``); returns blocks written."""
        import os

        os.makedirs(self.out_dir, exist_ok=True)
        sock = socket.create_connection((self.host, self.port))
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

        with sock:
            fh_in = sock.makefile("rb")
            fh_out = sock.makefile("wb")
            self._rpc(fh_in, fh_out, "findIntersection", {"points": [start_point]})
            while max_blocks is None or n < max_blocks:
                resp = self._rpc(fh_in, fh_out, "nextBlock")
                result = resp.get("result", {})
                if result.get("direction") == "forward":
                    pending.append(result["block"])
                    n += 1
                    if len(pending) >= self.rotate_every:
                        flush()
                else:  # tip (or rollback in a real deployment)
                    break
        flush()
        return n

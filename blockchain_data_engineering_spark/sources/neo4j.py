"""Neo4j relationship sink passthrough (SURVEY §2.1 S6).

The engine's native graph representation is the edge-list parquet
table (``sources.io.write_edge_list``) — PageRank/neighborhoods run on
it directly (``operators.graph``). This module is the *passthrough*
for deployments with an existing Neo4j/Bolt consumer, mirroring the
reference's relationship save (src/etl_vol_transfers/main.py:190-209:
Neo4j Spark Connector, ``relationship=SENT_TO``, keyed Wallet nodes)
with three transports, broadest reach first:

1. :func:`write_neo4j_connector` — the same ``org.neo4j.spark.
   DataSource`` write the reference issues, parameterized (requires
   the connector jar on the classpath);
2. :func:`write_neo4j_bolt` — ``foreachPartition`` + the ``neo4j``
   Python driver: parallel UNWIND-MERGE batches over Bolt, no jar
   needed (import-gated: neither the jar nor the driver ships in this
   test environment);
3. :func:`write_cypher_script` — offline twin: the identical
   UNWIND-MERGE statements as ``.cypher`` files (one per partition,
   parameters inlined as literals) for ``cypher-shell``/LOAD-style
   replay. Fully testable without a server, so the statement shape —
   the part that breaks consumers — is pinned by unit tests.

All three write the same graph: ``MERGE (s:Wallet {address})
MERGE (r:Wallet {address}) MERGE (s)-[:SENT_TO {tx_hash, unit}]->(r)
SET value, value_adj`` — idempotent on replay (MERGE keys = the
deterministic content keys, H4 policy).
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame

REL_KEYS = ("tx_hash", "unit")
REL_PROPS = ("value", "value_adj")


def write_neo4j_connector(
    df: DataFrame,
    url: str,
    user: str,
    password: str,
    database: str = "neo4j",
    rel_type: str = "SENT_TO",
    src_col: str = "send_addr",
    dst_col: str = "rx_addr",
    rel_props: str = "tx_hash,unit,value,value_adj:value_ada",
    mode: str = "Overwrite",
) -> None:
    """The reference's connector write, parameterized. Requires the
    Neo4j Spark Connector jar (``org.neo4j:neo4j-connector-apache-spark``)
    on the classpath; raises Spark's ClassNotFound otherwise."""
    (
        df.write.mode(mode)
        .format("org.neo4j.spark.DataSource")
        .option("url", url)
        .option("authentication.basic.username", user)
        .option("authentication.basic.password", password)
        .option("database", database)
        .option("relationship", rel_type)
        .option("relationship.save.strategy", "keys")
        .option("relationship.source.save.mode", mode)
        .option("relationship.source.labels", ":Wallet")
        .option("relationship.source.node.keys", f"{src_col}:address")
        .option("relationship.target.save.mode", mode)
        .option("relationship.target.labels", ":Wallet")
        .option("relationship.target.node.keys", f"{dst_col}:address")
        .option("relationship.properties", rel_props)
        .save()
    )


def _unwind_cypher(rel_type: str) -> str:
    """One statement per batch: UNWIND rows, MERGE keyed nodes and the
    keyed relationship, SET value props. MERGE on (tx_hash, unit) makes
    micro-batch replays idempotent (exactly-once into Neo4j)."""
    return (
        "UNWIND $rows AS row "
        "MERGE (s:Wallet {address: row.send_addr}) "
        "MERGE (r:Wallet {address: row.rx_addr}) "
        f"MERGE (s)-[t:{rel_type} {{tx_hash: row.tx_hash, unit: row.unit}}]->(r) "
        "SET t.value = row.value, t.value_ada = row.value_adj"
    )


def write_neo4j_bolt(
    df: DataFrame,
    uri: str,
    user: str,
    password: str,
    database: str = "neo4j",
    rel_type: str = "SENT_TO",
    batch_size: int = 1000,
) -> None:
    """Parallel Bolt writer: every partition opens one driver session
    and sends UNWIND-MERGE batches — N executors write concurrently,
    bounded memory per batch. Needs ``pip install neo4j`` on the
    executors (absent here; the cypher-script twin below is the tested
    path)."""
    cypher = _unwind_cypher(rel_type)
    cols = ["send_addr", "rx_addr", "tx_hash", "unit", "value", "value_adj"]

    def write_partition(rows: Iterator) -> None:
        try:
            import neo4j  # type: ignore
        except ImportError as exc:  # pragma: no cover - env without driver
            raise RuntimeError(
                "write_neo4j_bolt needs the 'neo4j' Python driver on "
                "executors; use write_neo4j_connector (jar) or "
                "write_cypher_script (offline) instead"
            ) from exc
        driver = neo4j.GraphDatabase.driver(uri, auth=(user, password))
        try:
            with driver.session(database=database) as session:
                batch: list[dict] = []
                for row in rows:
                    batch.append({c: row[c] for c in cols})
                    if len(batch) >= batch_size:
                        session.run(cypher, rows=batch)
                        batch = []
                if batch:
                    session.run(cypher, rows=batch)
        finally:
            driver.close()

    df.select(*cols).foreachPartition(write_partition)


def cypher_for_rows(rows: Sequence[dict], rel_type: str = "SENT_TO") -> str:
    """The UNWIND-MERGE statement with the batch inlined as a Cypher
    list literal — what one Bolt batch sends, rendered replayable as
    text. Cypher map KEYS must be bare identifiers (JSON's quoted keys
    are a syntax error in cypher-shell), so maps are rendered key by
    key with only the VALUES JSON-encoded (valid Cypher scalars)."""

    def _map(row: dict) -> str:
        return (
            "{"
            + ", ".join(f"{k}: {json.dumps(v)}" for k, v in row.items())
            + "}"
        )

    rendered = "[" + ", ".join(_map(dict(r)) for r in rows) + "]"
    return _unwind_cypher(rel_type).replace("$rows", rendered) + ";"


def write_cypher_script(
    df: DataFrame,
    out_dir: str,
    rel_type: str = "SENT_TO",
    batch_size: int = 1000,
) -> int:
    """Offline twin: ``.cypher`` files of idempotent UNWIND-MERGE
    statements (one file per ``batch_size`` rows) for cypher-shell.
    Returns the number of edge rows written. Rows stream through the
    driver via ``toLocalIterator`` (one partition in memory at a
    time); a cluster deployment swaps this loop for ``mapPartitions``
    + a distributed-FS write with the same statements."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    cols = ["send_addr", "rx_addr", "tx_hash", "unit", "value", "value_adj"]
    n = 0
    fi = 0
    batch: list[dict] = []

    def flush() -> None:
        nonlocal fi, batch
        if not batch:
            return
        with open(os.path.join(out_dir, f"part-{fi:04d}.cypher"), "w") as fh:
            fh.write(cypher_for_rows(batch, rel_type) + "\n")
        fi += 1
        batch = []

    for row in df.select(*cols).toLocalIterator():
        batch.append(row.asDict())
        n += 1
        if len(batch) >= batch_size:
            flush()
    flush()
    return n

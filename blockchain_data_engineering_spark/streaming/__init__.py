"""Structured Streaming layer (SURVEY.md §2.9 + §7.2 M4).

The reference streams blocks over a raw TCP socket with no watermark,
no checkpoint, and no idempotence — a restart re-appends everything and
uuid() keys make duplicates undetectable (hazards T3/H1/H4). This layer
adds the streaming hygiene Spark provides natively:

- replayable sources (file/NDJSON replay for tests, rate for load,
  socket kept for live parity);
- event-time watermarks + tumbling/sliding/session windows +
  dropDuplicatesWithinWatermark;
- a checkpointed foreachBatch multi-sink runner that persists each
  micro-batch once and writes all sinks from the SAME materialized
  data (fixing the recompute-per-action H1 hazard).
"""

"""Blockchain domain layer (SURVEY.md §7.2 M2).

Re-expresses the reference pipeline's Cardano semantics —
block parsing, UTxO input resolution, per-(address, unit) net flows,
ADA-priced volumes, transfer edges, rollups — as declarative DataFrame
plans over the declared nested schema. The reference computed all of
this in five row-at-a-time Python UDFs (SURVEY §2.10 U1-U5); here every
kernel is a Catalyst expression pipeline.
"""

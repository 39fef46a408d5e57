"""Deterministic synthetic block stream for domain tests.

Generates NDJSON block lines in the exact shape of the reference's
socket stream (jsonpickle envelope, FIXTURES.md §1) plus price/decimals
dimensions, honoring the §7 quirk checklist:

- UTxO discipline: every input references an output produced in an
  earlier block (so join resolution has hits), plus a configurable
  fraction of dangling refs (genesis-style misses).
- ADA appears in every output ("ada"/"lovelace" → the adalovelace
  rewrite path); token quantities are large stringified ints.
- Some addresses appear on both sides of a tx (change outputs →
  net 0 → dropped by the netflow kernel).
- Some units missing from prices (adj 0) or decimals (unscaled).
- Asset name hex decodes to UTF-8 (the F6 label path).
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass, field


@dataclass
class SyntheticChain:
    lines: list[str] = field(default_factory=list)  # NDJSON block lines
    prices: list[dict] = field(default_factory=list)
    decimals: list[dict] = field(default_factory=list)
    # flat golden inputs for an independent oracle:
    # outputs[(tx_hash, index)] = {"address": ..., "value": {unit: qty}}
    outputs: dict = field(default_factory=dict)
    # per tx: list of (spent_tx_hash, index)
    tx_inputs: dict = field(default_factory=dict)
    blocks: list[dict] = field(default_factory=list)


def _hex(rng: random.Random, n: int) -> str:
    return "".join(rng.choice("0123456789abcdef") for _ in range(n))


def generate_chain(
    n_blocks: int = 30,
    seed: int = 42,
    start_height: int = 10_763_546,
    start_slot: int = 133_303_300,
) -> SyntheticChain:
    rng = random.Random(seed)
    chain = SyntheticChain()

    addresses = [f"addr1{_hex(rng, 20)}" for _ in range(12)]
    # token units: policy(56 hex) + utf8-decodable name hex
    names = ["OPT", "MIN", "AGIX", "HOSKY", "SNEK"]
    tokens = [_hex(rng, 56) + name.encode().hex() for name in names]

    # dims: token[0] priced+decimals, token[1] priced no decimals,
    # token[2] priced decimals=0, token[3] no price, token[4] price 0
    chain.prices = [
        {"unit": tokens[0], "symbol": "OPT", "last_price_usd": 0.02,
         "last_price_ada": 0.05, "last_update": "2025-02-06T00:00:00Z",
         "pricing_provider": "synth"},
        {"unit": tokens[1], "symbol": "MIN", "last_price_usd": 0.4,
         "last_price_ada": 1.25, "last_update": "2025-02-06T00:00:00Z",
         "pricing_provider": "synth"},
        {"unit": tokens[2], "symbol": "AGIX", "last_price_usd": 0.8,
         "last_price_ada": 2.5, "last_update": "2025-02-06T00:00:00Z",
         "pricing_provider": "synth"},
        {"unit": tokens[4], "symbol": "SNEK", "last_price_usd": 0.0,
         "last_price_ada": 0.0, "last_update": "2025-02-06T00:00:00Z",
         "pricing_provider": "synth"},
    ]
    chain.decimals = [
        {"unit": tokens[0], "decimals": 6},
        {"unit": tokens[2], "decimals": 0},
        {"unit": tokens[4], "decimals": 8},
    ]

    spendable: list[tuple[str, int]] = []  # (tx_hash, output_index)

    for b in range(n_blocks):
        height = start_height + b
        slot = start_slot + b * 20
        block_hash = _hex(rng, 64)
        txs = []
        for _ in range(rng.randint(0, 4)):
            tx_hash = _hex(rng, 64)
            # inputs: spend 1-3 existing outputs (if any); ~5% dangling
            inputs = []
            n_in = rng.randint(1, 3)
            for _ in range(n_in):
                if spendable and rng.random() > 0.05:
                    ref = spendable.pop(rng.randrange(len(spendable)))
                else:
                    ref = (_hex(rng, 64), 0)  # dangling (unresolvable)
                inputs.append({"index": ref[1], "transaction": {"id": ref[0]}})

            # outputs: 1-4, each with ADA plus sometimes a token
            outputs = []
            in_addrs = [
                chain.outputs[ref]["address"]
                for ref in ((i["transaction"]["id"], i["index"]) for i in inputs)
                if ref in chain.outputs
            ]
            for oi in range(rng.randint(1, 4)):
                # change output: reuse an input address ~30% of the time
                if in_addrs and rng.random() < 0.3:
                    addr = rng.choice(in_addrs)
                else:
                    addr = rng.choice(addresses)
                value: dict = {"ada": {"lovelace": rng.randint(1_000_000, 50_000_000)}}
                if rng.random() < 0.6:
                    tok = rng.choice(tokens)
                    value[tok[:56]] = {tok[56:]: rng.randint(1, 5_000_000_000)}
                outputs.append(
                    {"address": addr, "datum": None, "value": json.dumps(value)}
                )
                flat = {}
                for pol, assets in value.items():
                    for nm, q in assets.items():
                        unit = pol + nm
                        unit = "lovelace" if unit == "adalovelace" else unit
                        flat[unit] = flat.get(unit, 0) + q
                chain.outputs[(tx_hash, oi)] = {"address": addr, "value": flat}
                spendable.append((tx_hash, oi))

            chain.tx_inputs[tx_hash] = [
                (i["transaction"]["id"], i["index"]) for i in inputs
            ]
            txs.append(
                {
                    "id": tx_hash,
                    "inputs": inputs,
                    "outputs": outputs,
                    "fee": str(rng.randint(150_000, 400_000)),
                }
            )

        block = {
            "py/state": {
                "blocktype": "praos",
                "era": "babbage",
                "height": height,
                "id": block_hash,
                "slot": slot,
                "transactions": txs,
            }
        }
        chain.blocks.append(block)
        chain.lines.append(json.dumps(block))

    return chain

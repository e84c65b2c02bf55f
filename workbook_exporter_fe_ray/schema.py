"""Arrow schemas and the tier registry.

The input schema is fixed by ``BASELINE.json.input_hint``; the tier/chunk
schemas are the engine's rolled-up output contract (FIXTURES.md §2).

Reference parity: the reference's fixed documented CSV schema
(``/root/reference/README.md:12-18``) maps onto INPUT_SCHEMA; its
per-exporter output shapes map onto the tier tables (SURVEY.md §1.3).
The TierSpec registry is the engine equivalent of the reference's
"add an exporter = register a function" extension surface
(``/root/reference/workbook_exporter-fe.py:1806-1918``).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

# ---------------------------------------------------------------------------
# Time constants (engine-visible spec, FIXTURES.md §1)
# ---------------------------------------------------------------------------

#: 2024-01-01T00:00:00Z in microseconds since the Unix epoch.
EPOCH0_US: int = 1_704_067_200_000_000
#: One raw point per source per minute: ts = EPOCH0 + seq * STEP_US.
STEP_US: int = 60_000_000

US = 1_000_000

# ---------------------------------------------------------------------------
# Schemas
# ---------------------------------------------------------------------------

#: Authoritative input table (BASELINE.json input_hint).
INPUT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)

#: Derived point rows (tokens dropped early — projection pushdown).
POINTS_SCHEMA = pa.schema(
    [
        pa.field("source", pa.string()),
        pa.field("ts", pa.timestamp("us")),
        pa.field("n_tok", pa.int32()),
    ]
)

#: One rolled-up bucket at any tier.
TIER_SCHEMA = pa.schema(
    [
        pa.field("source", pa.string()),
        pa.field("bucket_ts", pa.timestamp("us")),
        pa.field("count", pa.int64()),
        pa.field("sum", pa.int64()),
        pa.field("min", pa.int32()),
        pa.field("max", pa.int32()),
        pa.field("mean", pa.float64()),
    ]
)

#: Gorilla-compressed chunk of one (source, chunk-window) raw series.
CHUNK_SCHEMA = pa.schema(
    [
        pa.field("source", pa.string()),
        pa.field("chunk_start_ts", pa.timestamp("us")),
        pa.field("n_points", pa.int32()),
        pa.field("ts_dod_bytes", pa.binary()),
        pa.field("val_xor_bytes", pa.binary()),
        pa.field("first_ts", pa.int64()),
        pa.field("first_val", pa.float64()),
    ]
)


# ---------------------------------------------------------------------------
# Tier registry
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TierSpec:
    """One retention tier of the continuous-aggregate cascade.

    ``source_tier`` names the tier whose *partials* this tier is computed
    from (cascading aggregation — count/sum/min/max re-aggregate
    associatively; mean is derived as sum/count at the end). ``None``
    means "from raw points".

    ``retention_s`` is the tier's retention window in seconds measured
    back from the newest bucket in the run; ``None`` keeps everything.
    """

    name: str
    bucket_s: int
    source_tier: str | None
    retention_s: int | None = None

    @property
    def bucket_us(self) -> int:
        return self.bucket_s * US


#: The default 1m→5m→1h→1d cascade (north rule). Order matters: each
#: tier is built from the previous one's partials.
DEFAULT_TIERS: tuple[TierSpec, ...] = (
    TierSpec("1m", 60, None),
    TierSpec("5m", 300, "1m"),
    TierSpec("1h", 3600, "5m"),
    TierSpec("1d", 86400, "1h"),
)

TIER_BY_NAME = {t.name: t for t in DEFAULT_TIERS}

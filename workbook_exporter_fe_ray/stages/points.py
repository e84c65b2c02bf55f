"""Point derivation: tokenized-sequence rows → (source, ts, n_tok) points.

Spec (FIXTURES.md §1): ``seq = int(doc_id.rsplit('-', 1)[1])`` (a fixed
12-digit suffix), ``ts = EPOCH0 + seq * 60s``, measured value =
``n_tok``.

Reference parity: this is the engine analog of the per-row projection
``process_row_generic`` (``/root/reference/workbook_exporter-fe.py:
1651-1687``) — but vectorized over zero-copy Arrow batches instead of
``iterrows()`` (``:1639-1640``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..schema import EPOCH0_US, STEP_US


def derive_points_batch(batch: pa.Table) -> pa.Table:
    """Vectorized: doc_id → seq (last 12 chars) → ts; keep source, n_tok."""
    seq = pc.cast(pc.utf8_slice_codeunits(batch["doc_id"], start=-12), pa.int64())
    ts_us = pc.add(pc.multiply(seq, STEP_US), EPOCH0_US)
    return pa.table(
        {
            "source": batch["source"],
            "ts": pc.cast(ts_us, pa.timestamp("us")),
            "n_tok": batch["n_tok"],
        }
    )


def derive_points(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Dataset of input rows (tokens already pruned) → dataset of points."""
    return ds.map_batches(derive_points_batch, batch_format="pyarrow", zero_copy_batch=True)


def derive_points_carry_tokens_batch(batch: pa.Table) -> pa.Table:
    """Invariant-check path: same point derivation, but ``doc_id`` and the
    ``tokens`` list column are carried through zero-copy so per-row
    token-array equality against the input can be asserted downstream
    (the input_hint's per-row invariant). Never used on the rollup path —
    tokens are ≫99% of input bytes and are pruned at the read there."""
    pts = derive_points_batch(batch)
    return pts.append_column("doc_id", batch["doc_id"]).append_column(
        "tokens", batch["tokens"]
    )


def derive_points_carry_tokens(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(
        derive_points_carry_tokens_batch, batch_format="pyarrow", zero_copy_batch=True
    )

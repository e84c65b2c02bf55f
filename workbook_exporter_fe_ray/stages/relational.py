"""Relational / per-record operators from the reference's transform
semantics (SURVEY.md §2.2/§2.3/§2.4) re-expressed as vectorized Ray
Data stages over the driver's `events` / `documents` tables.

Each operator cites the reference behavior it mirrors:

- :func:`json_extract_k` — the reference's delimited list-in-string
  parsing (``/root/reference/workbook_exporter-fe.py:658-671`` splits
  ``jmx_ports``); here a JSON-ish ``props`` string column is parsed
  with one compiled-regex Arrow kernel per batch (§2.8 scalar funcs).
- :func:`classify_by_substring` — the hostname-substring classifier
  (``:1006-1011``: 'lsp' in name → lsp, 'ess' → ess, else acm; F9).
- :func:`probe_fanout` — the blackbox probe fan-out (``:270-314``: one
  row conditionally emits up to 4 probe entries tagged with a module;
  F8 flat-map semantics).
- :func:`retention_filter` — the retention cut of the north rule's
  tiered retention windows (drop points older than the tier keeps).
- :func:`first_event_per_user` — grouped first-row pick
  (``exporter_weblm``, ``:1049`` takes ``.iloc[0]``; A3).
- :func:`broadcast_anti_join` — the resume anti-join done right:
  the reference re-reads the output file per row
  (``ip_exists_in_yaml``, ``:1741-1754``; ST2/J1); here the small
  "already done" key set is put in the object store ONCE and each
  batch filters against it vectorized (never re-shipped per batch).
- :func:`sessionize` — gap-based session windows per user: the
  windowed-aggregate custom operator the Dataset API lacks, built as
  a coarse-partition sweep (``hash(user) % P`` routing, vectorized
  diff/reduceat over user runs — no per-user UDF calls).

Grouped operators here follow the ``stages/sweep.py`` execution shape:
per-block partial reduction where semantics allow, then ONE vectorized
group call per coarse partition instead of one Python call per key —
the difference between O(keys) interpreter overhead and O(P) at
millions of keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

US = 1_000_000


# ---------------------------------------------------------------------------
# scalar parsing / classification
# ---------------------------------------------------------------------------


def json_extract_k(events: ray.data.Dataset) -> ray.data.Dataset:
    """Parse ``props`` ('{"k": N}') and aggregate per event_type:
    (source, n, sum_k). Regex runs as one Arrow kernel per batch."""
    from ray.data.aggregate import Count, Sum

    def _parse(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"], r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": b["event_type"], "k": k})

    parsed = events.map_batches(_parse, batch_format="pyarrow", zero_copy_batch=True)
    agg = parsed.groupby("event_type").aggregate(Count(), Sum("k"))
    return agg.map_batches(
        lambda b: pa.table(
            {
                "source": b["event_type"],
                "n": pc.cast(b["count()"], pa.int64()),
                "sum_k": pc.cast(b["sum(k)"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def classify_by_substring(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Substring classifier (reference F9): source containing '1' →
    'lsp', containing '2' → 'ess', else 'acm'; per class count + chars."""
    from ray.data.aggregate import Count, Sum

    def _classify(b: pa.Table) -> pa.Table:
        src = b["source"]
        cls = pc.if_else(
            pc.match_substring(src, "1"),
            pa.scalar("lsp"),
            pc.if_else(pc.match_substring(src, "2"), pa.scalar("ess"), pa.scalar("acm")),
        )
        return pa.table({"class": cls, "n_chars": b["n_chars"]})

    classified = docs.map_batches(_classify, batch_format="pyarrow", zero_copy_batch=True)
    agg = classified.groupby("class").aggregate(Count(), Sum("n_chars"))
    return agg.map_batches(
        lambda b: pa.table(
            {
                "class": b["class"],
                "n_docs": pc.cast(b["count()"], pa.int64()),
                "total_chars": pc.cast(b["sum(n_chars)"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# fan-out / filters
# ---------------------------------------------------------------------------


def probe_fanout(events: ray.data.Dataset) -> ray.data.Dataset:
    """Conditional multi-emit (reference F8): every event emits an
    'icmp' probe; value ≥ 50 also emits 'http'; event_type == 'error'
    also emits 'ssh'. One row → 1-3 rows, all inside one map_batches."""

    def _one(eid: pa.ChunkedArray | pa.Array, module: str) -> pa.Table:
        mod = pa.array([module] * len(eid))
        # probe key '<id>:<module>' — the reference's f'{ip}:{port}' key
        # concat (:282), vectorized
        key = pc.binary_join_element_wise(
            pc.cast(eid, pa.string()), mod, ":"
        )
        return pa.table({"event_id": eid, "module": mod, "probe_key": key})

    def _fan(b: pa.Table) -> pa.Table:
        eid = b["event_id"]
        parts = [_one(eid, "icmp")]
        parts.append(_one(eid.filter(pc.greater_equal(b["value"], 50.0)), "http"))
        parts.append(_one(eid.filter(pc.equal(b["event_type"], "error")), "ssh"))
        return pa.concat_tables(parts)

    return events.map_batches(_fan, batch_format="pyarrow", zero_copy_batch=True)


def retention_filter(
    events: ray.data.Dataset, cutoff_iso: str = "2024-01-15"
) -> ray.data.Dataset:
    """Retention cut: keep rows with ts >= cutoff (per-tier retention
    windows drop expired buckets the same way — a pushdown-able mask)."""
    import datetime as dt

    cutoff = dt.datetime.fromisoformat(cutoff_iso)

    def _keep(b: pa.Table) -> pa.Table:
        mask = pc.greater_equal(b["ts"], pa.scalar(cutoff, pa.timestamp("us")))
        return b.filter(mask).select(["event_id", "user_id", "ts"])

    return events.map_batches(_keep, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# grouped picks / anti-join / sessions
# ---------------------------------------------------------------------------


def first_event_per_user(
    events: ray.data.Dataset, num_partitions: int = 64
) -> ray.data.Dataset:
    """Grouped first-row pick (reference A3): per user the earliest
    event's (ts, type). Deterministic tie-break (ts, event_id).

    Scale shape (millions of users): per-batch partial pick collapses
    each block to one candidate row per user BEFORE the exchange, and
    the reduce is a coarse-partition sweep (``hash(user) % P`` →
    ``num_partitions`` vectorized group calls total), never one Python
    call per user."""
    from .sweep import run_starts_table, with_part

    sort_keys = [
        ("user_id", "ascending"),
        ("ts", "ascending"),
        ("event_id", "ascending"),
    ]

    def _cut(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=sort_keys)
        t = t.take(idx)
        return t.take(pa.array(run_starts_table(t, ["user_id"])))

    def _partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": b["user_id"],
                "ts": b["ts"],
                "event_id": b["event_id"],
                "event_type": b["event_type"],
            }
        )
        return with_part(_cut(t), ["user_id"], num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        first = _cut(g)
        return pa.table(
            {
                "user_id": first["user_id"],
                "first_ts": first["ts"],
                "first_type": first["event_type"],
            }
        )

    partial = events.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    return partial.groupby("__part").map_groups(_sweep, batch_format="pyarrow")


def broadcast_anti_join(
    events: ray.data.Dataset,
    exclude_type: str = "error",
    exclude_before_iso: str = "2024-01-02",
) -> ray.data.Dataset:
    """Resume anti-join (reference ST2/J1 done right): drop ALL events
    of users who produced an ``exclude_type`` event before the cutoff
    (the "already processed" seed set of a resumed run). The excluded
    key set is computed once, ``ray.put`` once, and read zero-copy in
    every filter task — not re-read per row like the reference, not
    re-shipped per batch."""
    import datetime as dt

    cutoff = dt.datetime.fromisoformat(exclude_before_iso)

    def _seed(b: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(b["event_type"], exclude_type),
            pc.less(b["ts"], pa.scalar(cutoff, pa.timestamp("us"))),
        )
        return b.filter(mask).select(["user_id"])

    done = events.map_batches(_seed, batch_format="pyarrow", zero_copy_batch=True)
    done_ids = np.unique(
        np.concatenate(
            [
                b["user_id"].to_numpy(zero_copy_only=False)
                for b in done.iter_batches(batch_size=None, batch_format="pyarrow")
            ]
            or [np.array([], np.int64)]
        )
    )
    ref = ray.put(done_ids)

    class _AntiFilter:
        def __init__(self, ids_ref):
            self.ids = ray.get(ids_ref) if isinstance(ids_ref, ray.ObjectRef) else ids_ref

        def __call__(self, b: pa.Table) -> pa.Table:
            uid = b["user_id"].to_numpy(zero_copy_only=False)
            keep = ~np.isin(uid, self.ids)
            return b.filter(pa.array(keep)).select(["event_id"])

    return events.map_batches(
        _AntiFilter,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


def hash_sample(docs: ray.data.Dataset, hex_digits: str = "0") -> ray.data.Dataset:
    """Deterministic content-hash sampling: keep docs whose md5(text)
    starts with one of ``hex_digits`` (~len/16 of the corpus). The
    reproducible alternative to random sampling for training-data
    subsetting — the same rows are kept on every engine and every run."""
    import hashlib

    digits = frozenset(hex_digits)

    def _keep(b: pa.Table) -> pa.Table:
        mask = [
            hashlib.md5(t.encode("utf-8")).hexdigest()[0] in digits
            for t in b["text"].to_pylist()
        ]
        return b.filter(pa.array(mask)).select(["doc_id", "source"])

    return docs.map_batches(_keep, batch_format="pyarrow", zero_copy_batch=True)


def union_distinct_users(events: ray.data.Dataset) -> ray.data.Dataset:
    """Disjoint-source union + distinct (reference §2.7: multi-exporter
    output is a disjoint-key union): distinct users over purchase ∪
    signup events."""
    a = events.filter(expr="event_type == 'purchase'").select_columns(["user_id"])
    b = events.filter(expr="event_type == 'signup'").select_columns(["user_id"])
    u = a.union(b)
    agg = u.groupby("user_id").count()
    return agg.map_batches(
        lambda t: pa.table({"user_id": t["user_id"]}), batch_format="pyarrow"
    )


def topn_per_group(
    events: ray.data.Dataset, n: int = 2, num_partitions: int = 64
) -> ray.data.Dataset:
    """Top-N rows per group (window-rank semantics): the N highest-value
    events per event_type, deterministic tie-break by event_id.

    Scale shape: per-batch partial top-n (one sort + run-length cut —
    the shuffle moves ≤ n × keys × blocks rows), then a coarse-partition
    sweep (``num_partitions`` group calls total, vectorized over all
    keys a partition holds)."""
    from .sweep import run_starts_table, with_part

    sort_keys = [
        ("event_type", "ascending"),
        ("value", "descending"),
        ("event_id", "ascending"),
    ]

    def _cut(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=sort_keys)
        t = t.take(idx)
        starts = run_starts_table(t, ["event_type"])
        if len(starts) == 0:
            return t
        lens = np.diff(np.r_[starts, len(t)])
        pos = np.arange(len(t)) - np.repeat(starts, lens)
        return t.filter(pa.array(pos < n))

    def _partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": b["event_type"],
                "value": b["value"],
                "event_id": b["event_id"],
            }
        )
        return with_part(_cut(t), ["event_type"], num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        top = _cut(g)
        return pa.table(
            {
                "source": top["event_type"],
                "event_id": top["event_id"],
                "value": top["value"],
            }
        )

    partial = events.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    return partial.groupby("__part").map_groups(_sweep, batch_format="pyarrow")


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str = "source",
    left_ts: str = "ts",
    right_ts: str = "bucket_ts",
    value_cols: tuple[str, ...] = ("mean_cents",),
    left_carry: tuple[str, ...] = ("event_id",),
) -> ray.data.Dataset:
    """As-of join: for each left row, attach the latest right row with
    ``right_ts <= left_ts`` for the same key (inner: left rows with no
    prior right row are dropped).

    TEST ORACLE — do not use at scale. One entire key's history is
    held per group task, so this is kept only as the bit-identity
    oracle for :func:`asof_join_windowed` (the production plan, which
    windows by (key, window) with a broadcast last-row carry and is
    what the driver grades).

    Ray Data has no co-group, so both sides are tagged into one dataset
    with a common schema and grouped by key; inside each group one
    vectorized ``searchsorted`` matches every left ts against the sorted
    right timestamps.

    Null-column dtypes in the tagged union are derived from each side's
    actual schema, so any carry dtype works; ``value_cols`` are cast to
    float64 by contract (they are aggregate values).
    """
    left_schema = left.schema().base_schema
    carry_types = {c: left_schema.field(c).type for c in left_carry}

    def _tag_left(b: pa.Table) -> pa.Table:
        cols = {
            key: b[key],
            "__ts": pc.cast(b[left_ts], pa.int64()),
            "__kind": pa.array(np.ones(len(b), dtype=np.int8)),
        }
        for c in left_carry:
            cols[c] = b[c]
        for c in value_cols:
            cols[c] = pa.nulls(len(b), pa.float64())
        return pa.table(cols)

    def _tag_right(b: pa.Table) -> pa.Table:
        cols = {
            key: b[key],
            "__ts": pc.cast(b[right_ts], pa.int64()),
            "__kind": pa.array(np.zeros(len(b), dtype=np.int8)),
        }
        for c in left_carry:
            cols[c] = pa.nulls(len(b), carry_types[c])
        for c in value_cols:
            cols[c] = pc.cast(b[c], pa.float64())
        return pa.table(cols)

    tagged = left.map_batches(_tag_left, batch_format="pyarrow").union(
        right.map_batches(_tag_right, batch_format="pyarrow")
    )

    def _join_group(g: pa.Table) -> pa.Table:
        kind = g["__kind"].to_numpy(zero_copy_only=False)
        ts = g["__ts"].to_numpy(zero_copy_only=False)
        is_l = kind == 1
        r_ts = ts[~is_l]
        order_r = np.argsort(r_ts, kind="stable")
        r_ts = r_ts[order_r]
        out_cols: dict[str, pa.Array] = {}
        l_ts = ts[is_l]
        # latest right index with r_ts <= l_ts
        pos = np.searchsorted(r_ts, l_ts, side="right") - 1
        keep = pos >= 0
        l_idx = np.flatnonzero(is_l)[keep]
        r_idx = np.flatnonzero(~is_l)[order_r][pos[keep]]
        out_cols[key] = g[key].take(pa.array(l_idx))
        for c in left_carry:
            out_cols[c] = g[c].take(pa.array(l_idx))
        out_cols["ts"] = pa.array(l_ts[keep]).cast(pa.timestamp("us"))
        out_cols["asof_ts"] = pa.array(ts[r_idx]).cast(pa.timestamp("us"))
        for c in value_cols:
            out_cols[c] = g[c].take(pa.array(r_idx))
        return pa.table(out_cols)

    return tagged.groupby(key).map_groups(_join_group, batch_format="pyarrow")


def asof_join_windowed(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str = "source",
    left_ts: str = "ts",
    right_ts: str = "bucket_ts",
    value_cols: tuple[str, ...] = ("mean_cents",),
    left_carry: tuple[str, ...] = ("event_id",),
    window_s: int = 86_400,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """As-of join for UNBOUNDED histories — bit-identical output to
    :func:`asof_join`, but no task ever holds more than one (key,
    window) slice of either side.

    Shape: a tiny per-(key, window) summary of the RIGHT side (its last
    row per window — right is rollup-tier-sized, so summary rows =
    keys × windows, dimension-sized) is combined driver-side into
    per-key sorted window arrays and broadcast ONCE via ``ray.put``.
    Both sides then route to ``(key, window(ts))`` and a coarse-
    partition sweep joins each (key, window) run with one vectorized
    searchsorted, prepending the broadcast carry anchor — the last
    right row of the latest earlier window — so left rows before this
    window's first right row still match correctly across the window
    boundary."""
    from .sweep import run_starts_table, with_part

    window_us = window_s * US
    left_schema = left.schema().base_schema
    carry_types = {c: left_schema.field(c).type for c in left_carry}
    # right is consumed twice (anchor summary + tagged union); pin the
    # aggregated rows so its upstream pipeline is not executed twice
    right = right.materialize()

    # ---- per-(key, window) last right row (partials → driver combine)
    def _right_summary(b: pa.Table) -> pa.Table:
        ts = pc.cast(b[right_ts], pa.int64()).to_numpy(zero_copy_only=False)
        t_cols: dict[str, object] = {
            key: b[key],
            "w": pa.array((ts // window_us) * window_us, pa.int64()),
            "__ts": pa.array(ts, pa.int64()),
        }
        for c in value_cols:
            t_cols[c] = pc.cast(b[c], pa.float64())
        t = pa.table(t_cols)
        idx = pc.sort_indices(
            t,
            sort_keys=[(key, "ascending"), ("w", "ascending"), ("__ts", "ascending")],
        )
        t = t.take(idx)
        starts = run_starts_table(t, [key, "w"])
        lasts = np.r_[starts[1:], len(t)] - 1 if len(starts) else starts
        return t.take(pa.array(lasts))

    # bounded: <= one row per (key, window) run per BLOCK of the small
    # right side -- the broadcast-lookup build, never the event stream
    summary = pa.Table.from_pylist(
        right.map_batches(_right_summary, batch_format="pyarrow").take_all()
    )
    anchors: dict[str, tuple] = {}
    if len(summary):
        ks = summary[key].to_pylist()
        ws = summary["w"].to_numpy(zero_copy_only=False)
        tss = summary["__ts"].to_numpy(zero_copy_only=False)
        vals = {c: summary[c].to_numpy(zero_copy_only=False) for c in value_cols}
        per_key: dict[str, dict[int, tuple]] = {}
        for i in range(len(ks)):
            wins = per_key.setdefault(ks[i], {})
            cur = wins.get(int(ws[i]))
            if cur is None or tss[i] > cur[0]:
                wins[int(ws[i])] = (int(tss[i]), tuple(float(vals[c][i]) for c in value_cols))
        for k, wins in per_key.items():
            w_sorted = np.array(sorted(wins), dtype=np.int64)
            anchors[k] = (
                w_sorted,
                np.array([wins[w][0] for w in w_sorted], dtype=np.int64),
                np.array(
                    [wins[w][1] for w in w_sorted], dtype=np.float64
                ).reshape(len(w_sorted), len(value_cols)),
            )
    anchors_ref = ray.put(anchors)

    # ---- tag + route both sides to (key, window)
    def _tag_left(b: pa.Table) -> pa.Table:
        ts = pc.cast(b[left_ts], pa.int64())
        cols: dict[str, object] = {
            key: b[key],
            "w": pc.cast(pc.multiply(pc.divide(ts, window_us), window_us), pa.int64()),
            "__ts": ts,
            "__kind": pa.array(np.ones(len(b), dtype=np.int8)),
        }
        for c in left_carry:
            cols[c] = b[c]
        for c in value_cols:
            cols[c] = pa.nulls(len(b), pa.float64())
        return with_part(pa.table(cols), [key, "w"], num_partitions)

    def _tag_right(b: pa.Table) -> pa.Table:
        ts = pc.cast(b[right_ts], pa.int64())
        cols: dict[str, object] = {
            key: b[key],
            "w": pc.cast(pc.multiply(pc.divide(ts, window_us), window_us), pa.int64()),
            "__ts": ts,
            "__kind": pa.array(np.zeros(len(b), dtype=np.int8)),
        }
        for c in left_carry:
            cols[c] = pa.nulls(len(b), carry_types[c])
        for c in value_cols:
            cols[c] = pc.cast(b[c], pa.float64())
        return with_part(pa.table(cols), [key, "w"], num_partitions)

    tagged = left.map_batches(_tag_left, batch_format="pyarrow").union(
        right.map_batches(_tag_right, batch_format="pyarrow")
    )

    _cache: dict[str, dict] = {}

    def _sweep(group: pa.Table) -> pa.Table:
        anch = _cache.get("a")
        if anch is None:
            anch = (
                ray.get(anchors_ref)
                if isinstance(anchors_ref, ray.ObjectRef)
                else anchors_ref
            )
            _cache["a"] = anch
        idx = pc.sort_indices(
            group,
            sort_keys=[
                (key, "ascending"),
                ("w", "ascending"),
                ("__ts", "ascending"),
            ],
        )
        g = group.take(idx)
        starts = run_starts_table(g, [key, "w"])
        ends = np.r_[starts[1:], len(g)]
        kind = g["__kind"].to_numpy(zero_copy_only=False)
        ts_all = g["__ts"].to_numpy(zero_copy_only=False)
        w_all = g["w"].to_numpy(zero_copy_only=False)
        key_col = g[key]
        val_all = {
            c: g[c].to_numpy(zero_copy_only=False) for c in value_cols
        }
        out_l_idx: list[np.ndarray] = []
        out_asof: list[np.ndarray] = []
        out_vals: dict[str, list[np.ndarray]] = {c: [] for c in value_cols}
        for s, e in zip(starts, ends):
            is_l = kind[s:e] == 1
            l_pos = np.flatnonzero(is_l)
            if len(l_pos) == 0:
                continue
            r_pos = np.flatnonzero(~is_l)
            r_ts = ts_all[s:e][r_pos]
            r_val = {c: val_all[c][s:e][r_pos] for c in value_cols}
            # carry anchor: last right row of the latest earlier window
            k = key_col[s].as_py()
            a = anch.get(k)
            if a is not None:
                ws_arr, a_ts, a_vals = a
                ai = int(np.searchsorted(ws_arr, int(w_all[s]), side="left")) - 1
                if ai >= 0:
                    r_ts = np.r_[a_ts[ai], r_ts]
                    for ci, c in enumerate(value_cols):
                        r_val[c] = np.r_[a_vals[ai, ci], r_val[c]]
            l_ts = ts_all[s:e][l_pos]
            pos = np.searchsorted(r_ts, l_ts, side="right") - 1
            keep = pos >= 0
            out_l_idx.append(s + l_pos[keep])
            out_asof.append(r_ts[pos[keep]])
            for c in value_cols:
                out_vals[c].append(r_val[c][pos[keep]])
        if not out_l_idx:
            cols = {key: key_col.slice(0, 0)}
            for c in left_carry:
                cols[c] = g[c].slice(0, 0)
            cols["ts"] = pa.array([], pa.timestamp("us"))
            cols["asof_ts"] = pa.array([], pa.timestamp("us"))
            for c in value_cols:
                cols[c] = pa.array([], pa.float64())
            return pa.table(cols)
        l_idx = np.concatenate(out_l_idx)
        cols = {key: key_col.take(pa.array(l_idx))}
        for c in left_carry:
            cols[c] = g[c].take(pa.array(l_idx))
        cols["ts"] = pa.array(ts_all[l_idx]).cast(pa.timestamp("us"))
        cols["asof_ts"] = pa.array(np.concatenate(out_asof)).cast(pa.timestamp("us"))
        for c in value_cols:
            cols[c] = pa.array(np.concatenate(out_vals[c]), pa.float64())
        return pa.table(cols)

    return tagged.groupby("__part").map_groups(_sweep, batch_format="pyarrow")


def pivot_counts(
    events: ray.data.Dataset,
    key: str = "user_id",
    cat_col: str = "event_type",
    categories: tuple[str, ...] = ("click", "error", "purchase", "signup", "view"),
) -> ray.data.Dataset:
    """Pivot a categorical column into per-category count columns
    (``n_<cat>`` per key) — the reference's per-category variant-schema
    fan-out (F12) turned sideways.

    Wide-partial shape: each batch pivots locally (one 0/1 indicator
    column per category, grouped by key with Arrow's hash aggregate),
    so the shuffle carries one wide row per (key, block) and the final
    groupby just sums int64 columns associatively — never a per-key
    map_groups, never a row-per-(key,category) exchange.
    """
    cat_names = [f"n_{c}" for c in categories]

    def _partial(b: pa.Table) -> pa.Table:
        cols: dict[str, object] = {key: b[key]}
        for c, name in zip(categories, cat_names):
            cols[name] = pc.cast(pc.equal(b[cat_col], c), pa.int64())
        g = (
            pa.table(cols)
            .group_by(key)
            .aggregate([(n, "sum") for n in cat_names])
        )
        return g.rename_columns([key, *cat_names])

    agg = (
        events.map_batches(_partial, batch_format="pyarrow")
        .groupby(key)
        .sum(cat_names)
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                key: b[key],
                **{
                    n: pc.cast(b[f"sum({n})"], pa.int64())
                    for n in cat_names
                },
            }
        ),
        batch_format="pyarrow",
    )


def unpivot(
    ds: ray.data.Dataset,
    key: str,
    value_cols: tuple[str, ...],
    var_name: str = "variable",
    value_name: str = "value",
) -> ray.data.Dataset:
    """Wide → long (melt): one output row per (input row, value column)
    — the inverse of :func:`pivot_counts`. Pure per-batch reshape (one
    take + concat per batch, no shuffle, no per-row work)."""

    def _melt(b: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            parts.append(
                pa.table(
                    {
                        key: b[key],
                        var_name: pa.array([c] * len(b), pa.string()),
                        value_name: pc.cast(b[c], pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    return ds.map_batches(_melt, batch_format="pyarrow", zero_copy_batch=True)


def broadcast_dim_join(
    big: ray.data.Dataset,
    dim: pa.Table,
    big_key: str,
    dim_key: str,
    carry: tuple[str, ...],
) -> ray.data.Dataset:
    """Map-side (broadcast) equi-join: the dimension table is put in
    the object store ONCE and every batch resolves its keys with one
    vectorized ``searchsorted`` against the sorted dim keys — the big
    side streams through with NO shuffle. Inner semantics: rows whose
    key has no dim match are dropped.

    Partitioning assumption (documented per the brief): ``dim`` is
    dimension-sized (fits one worker's heap — nation/region/part
    class). A fact-fact join must instead co-partition both sides by
    key hash; that path is the packed exchange in
    ``pipelines/events.py``.
    """
    order = pc.sort_indices(dim[dim_key])
    dim = dim.take(order)
    keys_np = dim[dim_key].to_numpy(zero_copy_only=False)
    carry_np = {c: dim[c].to_numpy(zero_copy_only=False) for c in carry}
    dim_ref = ray.put((keys_np, carry_np))

    carry_types = {c: dim.schema.field(c).type for c in carry}

    class _Lookup:
        def __init__(self, ref):
            self.keys, self.carry = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            if len(self.keys) == 0:  # empty dim → empty inner join
                out = b.slice(0, 0)
                for c in carry:
                    out = out.append_column(c, pa.array([], carry_types[c]))
                return out
            bk = b[big_key].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.keys, bk)
            pos_c = np.minimum(pos, len(self.keys) - 1)
            hit = self.keys[pos_c] == bk
            b = b.filter(pa.array(hit))
            pos_c = pos_c[hit]
            for c, arr in self.carry.items():
                b = b.append_column(c, pa.array(arr[pos_c]))
            return b

    return big.map_batches(
        _Lookup,
        fn_constructor_args=(dim_ref,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def hash_bucket_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    left_carry: tuple[str, ...],
    right_carry: tuple[str, ...],
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Fact-fact equi-join by hash-bucket co-partition — the shuffle
    join for when neither side is dimension-sized (the brief's "bucket
    by key hash when you must co-locate"). Right side must be unique
    per key (primary-key join, e.g. orders on o_orderkey).

    Both sides are tagged into one stream with a ``__bucket = key mod
    n_buckets`` column; ONE groupby co-locates each bucket, and the
    per-bucket kernel does a vectorized sorted-merge lookup
    (searchsorted) across the many keys it holds — thousands of keys
    per group call, so the per-group Python overhead that makes
    per-key map_groups slow at scale never appears. ``n_buckets``
    bounds peak per-task memory: size it so fact_bytes / n_buckets
    fits a worker heap.

    Null-column dtypes in the tagged union are derived from each side's
    actual schema (one metadata peek per side), so carry columns of any
    dtype work.
    """
    l_schema = left.schema().base_schema
    r_schema = right.schema().base_schema
    l_types = {c: l_schema.field(c).type for c in left_carry}
    r_types = {c: r_schema.field(c).type for c in right_carry}

    def _tag(is_left: bool):
        def _t(b: pa.Table) -> pa.Table:
            k = pc.cast(b[key], pa.int64())
            if (n_buckets & (n_buckets - 1)) == 0:
                bucket = pc.cast(pc.bit_wise_and(k, n_buckets - 1), pa.int32())
            else:  # pyarrow has no mod kernel; numpy on the int64 view
                bucket = pa.array(
                    np.mod(k.to_numpy(zero_copy_only=False), n_buckets).astype(
                        np.int32
                    )
                )
            cols: dict[str, object] = {
                key: k,
                "__bucket": bucket,
                "__kind": pa.array(
                    np.full(len(b), 1 if is_left else 0, dtype=np.int8)
                ),
            }
            for c in left_carry:
                cols[c] = b[c] if is_left else pa.nulls(len(b), l_types[c])
            for c in right_carry:
                cols[c] = pa.nulls(len(b), r_types[c]) if is_left else b[c]
            return pa.table(cols)

        return _t

    tagged = left.map_batches(_tag(True), batch_format="pyarrow").union(
        right.map_batches(_tag(False), batch_format="pyarrow")
    )

    def _join_bucket(g: pa.Table) -> pa.Table:
        kind = g["__kind"].to_numpy(zero_copy_only=False)
        keys = g[key].to_numpy(zero_copy_only=False)
        is_l = kind == 1
        r_keys = keys[~is_l]
        order_r = np.argsort(r_keys, kind="stable")
        r_keys = r_keys[order_r]
        l_keys = keys[is_l]
        pos = np.searchsorted(r_keys, l_keys)
        pos_c = np.minimum(pos, max(len(r_keys) - 1, 0))
        hit = (r_keys[pos_c] == l_keys) if len(r_keys) else np.zeros(len(l_keys), bool)
        l_idx = np.flatnonzero(is_l)[hit]
        r_idx = np.flatnonzero(~is_l)[order_r][pos_c[hit]]
        cols = {key: g[key].take(pa.array(l_idx))}
        for c in left_carry:
            cols[c] = g[c].take(pa.array(l_idx))
        for c in right_carry:
            cols[c] = g[c].take(pa.array(r_idx))
        return pa.table(cols)

    return tagged.groupby("__bucket").map_groups(_join_bucket, batch_format="pyarrow")


def range_join_window_counts(
    events: ray.data.Dataset,
    key: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    n_windows: int = 5,
    window_s: int = 37 * 60,
) -> ray.data.Dataset:
    """Range (interval) join — the second custom timeseries join the
    Dataset API lacks (alongside :func:`asof_join`): every event whose
    timestamp falls inside a window ``[w_start, w_start + window_s]``
    of the same key matches that window; output is per-window match
    counts ``(key, w_start, n_matched)``.

    The window table is derived from the data itself (per key, the
    ``n_windows`` earliest rows by ``(ts, id)`` each open a window), so
    the oracle is pure SQL. Engine shape, sized for the 100 TB case:

    1. candidate min-n per key: per-batch partial top-n (vectorized
       run-length over a batch sort) → coarse-partition vectorized
       final pick — the shuffle moves ≤ ``n_windows × keys × blocks``
       rows, never the raw stream, and the reduce runs a bounded
       number of group calls regardless of key count;
    2. the tiny window table is ``ray.put`` ONCE and dereferenced per
       actor (broadcast, not re-shipped per batch — same pattern as
       :func:`broadcast_anti_join`);
    3. counting is two ``searchsorted`` calls per (batch, key) against
       the batch's sorted timestamps — no per-row loop, no big-side
       shuffle; partial counts reduce in a final tiny groupby-sum.

    Overlapping windows are counted independently (true interval-join
    semantics, not bucketing).
    """
    window_us = window_s * US

    from .sweep import run_starts_table, with_part

    num_partitions = 64
    sort_keys = [(key, "ascending"), ("__ts", "ascending"), (id_col, "ascending")]

    def _cut(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=sort_keys)
        t = t.take(idx)
        starts = run_starts_table(t, [key])
        if len(starts) == 0:
            return t
        pos = np.arange(len(t)) - np.repeat(starts, np.diff(np.r_[starts, len(t)]))
        return t.filter(pa.array(pos < n_windows))

    def _partial_min(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key: b[key],
                "__ts": pc.cast(b[ts_col], pa.int64()),
                id_col: b[id_col],
            }
        )
        return with_part(_cut(t), [key], num_partitions)

    def _final_min(g: pa.Table) -> pa.Table:
        g = _cut(g)
        return pa.table({key: g[key], "w_start": g["__ts"]})

    # bounded: key-domain-sized (one w_start per key after the grouped cut)
    windows_tbl = pa.Table.from_pylist(
        events.map_batches(_partial_min, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_final_min, batch_format="pyarrow")
        .take_all()
    )
    wk = windows_tbl[key].to_numpy(zero_copy_only=False)
    ws = windows_tbl["w_start"].to_numpy(zero_copy_only=False).astype(np.int64)
    worder = np.lexsort((ws, wk))
    wk, ws = wk[worder], ws[worder]
    ukeys, wrank = np.unique(wk, return_inverse=True)
    windows_ref = ray.put((ukeys, wk, ws, wrank.astype(np.int64)))

    class _WindowCounter:
        """Vectorized interval counter: ONE composite (key-rank, ts)
        sort of the batch + TWO searchsorted calls count every window
        at once — no per-key Python loop (VERDICT r2 item 2). An
        overflow-guarded run-sweep fallback covers the (huge key count
        × huge in-batch time span) corner where the composite int64
        encoding would not fit."""

        def __init__(self, ref):
            import pandas as pd

            self.ukeys, self.wk, self.ws, self.wrank = ray.get(ref)
            self.key_index = pd.Index(self.ukeys)  # hash map built once per actor

        def _empty(self) -> pa.Table:
            return pa.table(
                {
                    key: pa.array([], pa.string()),
                    "w_start": pa.array([], pa.int64()),
                    "n_partial": pa.array([], pa.int64()),
                }
            )

        def __call__(self, b: pa.Table) -> pa.Table:
            ts = pc.cast(b[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
            ks = b[key].to_numpy(zero_copy_only=False)
            rank = self.key_index.get_indexer(ks)  # -1 → key has no window
            m = rank >= 0
            if not m.any():
                return self._empty()
            r, t = rank[m].astype(np.int64), ts[m]
            tmin = t.min()
            o = t - tmin + 1  # offsets ≥ 1 so clamped-to-0 queries match nothing
            span = int(o.max()) + 2
            if len(self.ukeys) * span < (1 << 62):
                comp = np.sort(r * span + o)
                q_lo = np.clip(self.ws - tmin + 1, 0, span - 1)
                q_hi = np.clip(self.ws + window_us - tmin + 1, 0, span - 1)
                base = self.wrank * span
                cnt = np.searchsorted(comp, base + q_hi, side="right") - np.searchsorted(
                    comp, base + q_lo, side="left"
                )
            else:  # composite would overflow int64 — per-run sweep fallback
                order = np.lexsort((t, r))
                r, t = r[order], t[order]
                run_lo = np.r_[0, np.flatnonzero(r[1:] != r[:-1]) + 1]
                run_hi = np.r_[run_lo[1:], len(r)]
                cnt = np.zeros(len(self.ws), dtype=np.int64)
                woff = np.searchsorted(self.wrank, np.arange(len(self.ukeys) + 1))
                for lo, hi in zip(run_lo, run_hi):
                    a, z = woff[r[lo]], woff[r[lo] + 1]
                    seg = t[lo:hi]
                    cnt[a:z] = np.searchsorted(
                        seg, self.ws[a:z] + window_us, side="right"
                    ) - np.searchsorted(seg, self.ws[a:z], side="left")
            nz = cnt > 0
            if not nz.any():
                return self._empty()
            return pa.table(
                {
                    key: pa.array(self.wk[nz], pa.string()),
                    "w_start": pa.array(self.ws[nz], pa.int64()),
                    "n_partial": pa.array(cnt[nz], pa.int64()),
                }
            )

    partial = events.map_batches(
        _WindowCounter,
        fn_constructor_args=(windows_ref,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    summed = partial.groupby([key, "w_start"]).sum("n_partial")

    def _project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                key: b[key],
                "w_start": pc.cast(b["w_start"], pa.timestamp("us")),
                "n_matched": pc.cast(b["sum(n_partial)"], pa.int64()),
            }
        )

    return summed.map_batches(_project, batch_format="pyarrow")


def stratified_sample(
    docs: ray.data.Dataset,
    key: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> ray.data.Dataset:
    """Deterministic stratified sampling: per key, the ``n`` rows with
    the smallest content hash (md5 hex, tie-broken by id) — the same
    content-addressed determinism as :func:`hash_sample`, but with a
    per-stratum quota so every key is represented regardless of skew.

    Scale shape (same two-phase pick as the range-join candidate
    stage): each batch keeps only its local top-n per key (one sort +
    run-length cut), so the shuffle moves ≤ n × keys × blocks rows;
    the final per-key pick is a coarse-partition vectorized sweep
    (``num_partitions`` group calls, not one per stratum).
    """
    import hashlib

    from .sweep import run_starts_table, with_part

    num_partitions = 64
    sort_keys = [(key, "ascending"), ("__h", "ascending"), (id_col, "ascending")]

    def _cut(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=sort_keys)
        t = t.take(idx)
        starts = run_starts_table(t, [key])
        if len(starts) == 0:
            return t
        pos = np.arange(len(t)) - np.repeat(starts, np.diff(np.r_[starts, len(t)]))
        return t.filter(pa.array(pos < n))

    def _partial(b: pa.Table) -> pa.Table:
        md5s = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in b[text_col].to_pylist()
        ]
        t = pa.table({key: b[key], "__h": pa.array(md5s, pa.string()), id_col: b[id_col]})
        return with_part(_cut(t), [key], num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        g = _cut(g)
        return pa.table({key: g[key], id_col: g[id_col]})

    return (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_sweep, batch_format="pyarrow")
    )


def moving_window_agg(
    tier: ray.data.Dataset,
    window: int = 3,
    key: str = "source",
    ts_col: str = "bucket_ts",
    sum_col: str = "sum_cents",
    count_col: str = "n_points",
) -> ray.data.Dataset:
    """Sliding-window aggregate over a rolled-up tier: per key, ordered
    by bucket, the trailing-``window``-bucket sum/count/mean (ROWS
    window, not RANGE — matches SQL ``ROWS BETWEEN w-1 PRECEDING AND
    CURRENT ROW``). Sums stay exact int64; the mean is one int→float
    division, so floats are bit-deterministic.

    Vectorized prefix sums with per-key boundary resets; the
    streaming-window custom operator from the brief. Scale shape: one
    coarse-partition sweep (``hash(key) % P`` → ``num_partitions``
    group calls total), not one Python call per key."""
    from .sweep import run_starts_table, with_part

    num_partitions = 64

    def _route(b: pa.Table) -> pa.Table:
        t = pa.table(
            {key: b[key], ts_col: b[ts_col], sum_col: b[sum_col], count_col: b[count_col]}
        )
        return with_part(t, [key], num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(key, "ascending"), (ts_col, "ascending")]
        )
        g = g.take(idx)
        n = len(g)
        s = g[sum_col].to_numpy(zero_copy_only=False).astype(np.int64)
        c = g[count_col].to_numpy(zero_copy_only=False).astype(np.int64)
        starts = run_starts_table(g, [key])
        cs = np.concatenate([[0], np.cumsum(s)])
        cc = np.concatenate([[0], np.cumsum(c)])
        ar = np.arange(n)
        run_start = (
            np.repeat(starts, np.diff(np.r_[starts, n])) if n else np.array([], np.int64)
        )
        lo = np.maximum(ar - (window - 1), run_start)
        msum = cs[1 + ar] - cs[lo]
        mcount = cc[1 + ar] - cc[lo]
        return pa.table(
            {
                key: g[key],
                ts_col: g[ts_col],
                "w_sum": pa.array(msum, pa.int64()),
                "w_count": pa.array(mcount, pa.int64()),
                "w_mean": pa.array(
                    msum.astype(np.float64) / mcount.astype(np.float64)
                ),
            }
        )

    routed = tier.map_batches(_route, batch_format="pyarrow", zero_copy_batch=True)
    return routed.groupby("__part").map_groups(_sweep, batch_format="pyarrow")


def sessionize(
    events: ray.data.Dataset, gap_s: int = 3600, num_partitions: int = 64
) -> ray.data.Dataset:
    """Gap-based sessionization per user: a new session starts when the
    gap to the previous event exceeds ``gap_s``. Returns per user:
    (user_id, n_sessions, max_session_events, n_events).

    Scale shape: the shuffle carries only (user_id, ts) keyed on
    ``hash(user) % num_partitions``; one sweep per partition sorts by
    (user, ts) and computes every user's sessions with vectorized
    diff/reduceat kernels — no per-user Python calls. Partitioning
    assumption: one PARTITION's rows fit a worker (raise
    ``num_partitions`` for bigger corpora); a single user's history is
    never required to fit anything smaller than a partition."""
    from .sweep import run_starts_table, with_part

    gap_us = gap_s * US

    def _route(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"user_id": b["user_id"], "ts": pc.cast(b["ts"], pa.int64())}
        )
        return with_part(t, ["user_id"], num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("user_id", "ascending"), ("ts", "ascending")]
        )
        g = g.take(idx)
        n = len(g)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                    "max_session_events": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        ts = g["ts"].to_numpy(zero_copy_only=False)
        ustarts = run_starts_table(g, ["user_id"])
        new_s = np.zeros(n, dtype=bool)
        new_s[1:] = (ts[1:] - ts[:-1]) > gap_us
        new_s[ustarts] = True
        sess_starts = np.flatnonzero(new_s)
        sess_len = np.diff(np.r_[sess_starts, n])
        # sessions are contiguous per user (both sorted by the same order)
        sess_user = np.searchsorted(ustarts, sess_starts, side="right") - 1
        n_users = len(ustarts)
        n_sessions = np.bincount(sess_user, minlength=n_users)
        sess_offs = np.r_[0, np.cumsum(n_sessions)[:-1]]
        max_sess = np.maximum.reduceat(sess_len, sess_offs)
        n_events = np.diff(np.r_[ustarts, n])
        return pa.table(
            {
                "user_id": g["user_id"].take(pa.array(ustarts)),
                "n_sessions": pa.array(n_sessions.astype(np.int64)),
                "max_session_events": pa.array(max_sess.astype(np.int64)),
                "n_events": pa.array(n_events.astype(np.int64)),
            }
        )

    routed = events.map_batches(_route, batch_format="pyarrow", zero_copy_batch=True)
    return routed.groupby("__part").map_groups(_sweep, batch_format="pyarrow")


def bucket_rate(
    tier: ray.data.Dataset,
    key: str = "source",
    ts_col: str = "bucket_ts",
    sum_col: str = "sum_cents",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Derivative over a rolled-up tier: per key, ordered by bucket, the
    rate of change of the bucket sums — ``(sum - prev_sum) /
    ((ts - prev_ts)/1e6 s)`` — the counter-rate primitive of a
    timeseries engine (PromQL ``rate``-style, without reset handling;
    each key's first bucket has no predecessor and is dropped).

    Floats are bit-deterministic: the numerator and the second divide
    run on exact int64 diffs in a pinned order shared with the SQL
    oracle. Executes as one coarse-partition sweep (diff over key runs
    with boundary masking) — no per-key UDF calls.
    """
    from .sweep import run_starts_table, with_part

    def _route(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key: b[key],
                ts_col: pc.cast(b[ts_col], pa.int64()),
                sum_col: pc.cast(b[sum_col], pa.int64()),
            }
        )
        return with_part(t, [key], num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(key, "ascending"), (ts_col, "ascending")]
        )
        g = g.take(idx)
        n = len(g)
        if n == 0:
            return pa.table(
                {
                    key: g[key],
                    ts_col: pa.array([], pa.timestamp("us")),
                    "delta": pa.array([], pa.int64()),
                    "rate_per_s": pa.array([], pa.float64()),
                }
            )
        ts = g[ts_col].to_numpy(zero_copy_only=False)
        s = g[sum_col].to_numpy(zero_copy_only=False)
        starts = run_starts_table(g, [key])
        first = np.zeros(n, dtype=bool)
        first[starts] = True
        d_s = np.empty(n, dtype=np.int64)
        d_t = np.ones(n, dtype=np.int64)
        d_s[1:] = s[1:] - s[:-1]
        d_s[0] = 0
        d_t[1:] = ts[1:] - ts[:-1]
        keep = ~first
        # pinned float order: (f8(delta) / f8(delta_ts)) * 1e6
        rate = (
            d_s[keep].astype(np.float64) / d_t[keep].astype(np.float64)
        ) * 1_000_000.0
        sel = pa.array(np.flatnonzero(keep))
        return pa.table(
            {
                key: g[key].take(sel),
                ts_col: pa.array(ts[keep]).cast(pa.timestamp("us")),
                "delta": pa.array(d_s[keep], pa.int64()),
                "rate_per_s": pa.array(rate, pa.float64()),
            }
        )

    routed = tier.map_batches(_route, batch_format="pyarrow", zero_copy_batch=True)
    return routed.groupby("__part").map_groups(_sweep, batch_format="pyarrow")


def grouped_topk_items(
    ds: ray.data.Dataset,
    key: str = "event_type",
    item: str = "user_id",
    k: int = 3,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Per key, the k most frequent ``item`` values (count desc, item
    asc tie-break) — grouped heavy hitters, EXACT.

    Scale shape: each block pre-aggregates to distinct (key, item)
    partial counts (Arrow hash aggregate — the combiner), so the
    exchange carries at most one row per (key, item, block); the
    reduce is one coarse-partition sweep that merges duplicate pairs
    with a reduceat and cuts each key run to k — no per-key UDF calls,
    no row-per-occurrence shuffle.
    """
    from .sweep import run_starts_table, with_part

    def _partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table({key: b[key], item: b[item]})
            .group_by([key, item])
            .aggregate([([], "count_all")])
        )
        g = g.rename_columns([key, item, "cnt"])
        return with_part(g, [key], num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(key, "ascending"), (item, "ascending")]
        )
        g = g.take(idx)
        if len(g) == 0:
            return pa.table(
                {
                    key: g[key],
                    item: g[item],
                    "n": pa.array([], pa.int64()),
                }
            )
        # merge duplicate (key, item) pairs from different blocks
        pair_starts = run_starts_table(g, [key, item])
        cnt = np.add.reduceat(
            g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64), pair_starts
        )
        merged = pa.table(
            {
                key: g[key].take(pa.array(pair_starts)),
                item: g[item].take(pa.array(pair_starts)),
                "n": pa.array(cnt, pa.int64()),
            }
        )
        # per-key top-k by (count desc, item asc)
        idx2 = pc.sort_indices(
            merged,
            sort_keys=[(key, "ascending"), ("n", "descending"), (item, "ascending")],
        )
        merged = merged.take(idx2)
        starts = run_starts_table(merged, [key])
        lens = np.diff(np.r_[starts, len(merged)])
        pos = np.arange(len(merged)) - np.repeat(starts, lens)
        return merged.filter(pa.array(pos < k))

    return (
        ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(_sweep, batch_format="pyarrow")
    )


def global_hash_topk_sample(
    docs: ray.data.Dataset,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Global deterministic k-row sample: the k rows with the smallest
    content hash (md5 hex, tie-broken by id) — reservoir-sampling
    semantics made reproducible across engines, runs and cluster
    sizes. Each block keeps only its local k candidates (the shuffle
    moves ≤ k × blocks rows), one tiny task merges.
    """
    import hashlib

    def _partial(b: pa.Table) -> pa.Table:
        md5s = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in b[text_col].to_pylist()
        ]
        t = pa.table({"__h": pa.array(md5s, pa.string()), id_col: b[id_col]})
        idx = pc.sort_indices(
            t, sort_keys=[("__h", "ascending"), (id_col, "ascending")]
        )
        return t.take(idx[:k])

    def _merge(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("__h", "ascending"), (id_col, "ascending")]
        )
        g = g.take(idx[:k])
        return pa.table({id_col: g[id_col], "content_md5": g["__h"]})

    partial = docs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    return partial.repartition(1).map_batches(_merge, batch_format="pyarrow")


def left_join_order_counts(
    customers: ray.data.Dataset, orders: ray.data.Dataset
) -> ray.data.Dataset:
    """LEFT OUTER join: every customer with its order count, zero
    preserved for order-less customers (the semantics the reference's
    inner-only lookups cannot express).

    Scale shape: the fact side is collapsed FIRST — per-block partial
    counts per ``o_custkey`` (one Arrow ``group_by`` per block), then an
    associative groupby-sum, so the exchange carries keys × blocks tiny
    rows, bounded by the distinct-customer count.  The aggregated count
    table is ``ray.put`` once and each customer batch resolves it with
    one vectorized ``searchsorted`` — the dimension stream itself never
    shuffles.  When the distinct-key aggregate outgrows a worker heap
    (billions of active customers), swap the broadcast for the
    ``hash_bucket_join`` co-partition path; the partial-count stage is
    unchanged.
    """
    from ray.data.aggregate import Sum

    def _partial(b: pa.Table) -> pa.Table:
        return (
            pa.table({"k": b["o_custkey"]})
            .group_by("k")
            .aggregate([("k", "count")])
        )

    counts = (
        orders.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(Sum("k_count"))
    )
    ks, ns = [], []
    for b in counts.iter_batches(batch_size=None, batch_format="pyarrow"):
        ks.append(b["k"].to_numpy(zero_copy_only=False))
        ns.append(b["sum(k_count)"].to_numpy(zero_copy_only=False))
    keys = np.concatenate(ks or [np.array([], np.int64)])
    vals = np.concatenate(ns or [np.array([], np.int64)]).astype(np.int64)
    order = np.argsort(keys, kind="stable")
    ref = ray.put((keys[order], vals[order]))

    class _Attach:
        def __init__(self, ref):
            self.keys, self.vals = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, b: pa.Table) -> pa.Table:
            ck = b["c_custkey"].to_numpy(zero_copy_only=False)
            n = np.zeros(len(ck), np.int64)
            if len(self.keys):
                pos = np.searchsorted(self.keys, ck)
                pos_c = np.minimum(pos, len(self.keys) - 1)
                hit = self.keys[pos_c] == ck
                n[hit] = self.vals[pos_c[hit]]
            return pa.table(
                {
                    "c_custkey": b["c_custkey"],
                    "c_mktsegment": b["c_mktsegment"],
                    "n_orders": pa.array(n, pa.int64()),
                }
            )

    return customers.map_batches(
        _Attach,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


def semi_join_hot_orders(
    orders: ray.data.Dataset,
    lineitem: ray.data.Dataset,
    min_quantity: float = 48.0,
) -> ray.data.Dataset:
    """Semi join (EXISTS): orders having at least one line item with
    quantity ≥ ``min_quantity``.  Mirrors ``broadcast_anti_join`` with
    keep-instead-of-drop semantics: the qualifying key set is reduced
    to distinct ids (bounded by matching orders, far smaller than the
    fact table), ``ray.put`` once, and each orders batch filters with
    one vectorized ``np.isin`` — no shuffle of either fact stream.
    """

    def _seed(b: pa.Table) -> pa.Table:
        mask = pc.greater_equal(b["l_quantity"], min_quantity)
        return b.filter(mask).select(["l_orderkey"])

    hot = lineitem.map_batches(_seed, batch_format="pyarrow", zero_copy_batch=True)
    ids = np.unique(
        np.concatenate(
            [
                b["l_orderkey"].to_numpy(zero_copy_only=False)
                for b in hot.iter_batches(batch_size=None, batch_format="pyarrow")
            ]
            or [np.array([], np.int64)]
        )
    )
    ref = ray.put(ids)

    class _Semi:
        def __init__(self, ref):
            self.ids = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, b: pa.Table) -> pa.Table:
            ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
            keep = np.isin(ok, self.ids)
            return b.filter(pa.array(keep)).select(["o_orderkey", "o_orderpriority"])

    return orders.map_batches(
        _Semi,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


def bloom_semi_join(
    fact: ray.data.Dataset,
    keys: ray.data.Dataset,
    fact_key: str = "l_orderkey",
    key_col: str = "o_orderkey",
    out_cols: tuple[str, ...] = ("l_orderkey", "l_linenumber", "l_suppkey"),
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> ray.data.Dataset:
    """Semi join with a broadcast Bloom prefilter — the 100 TB shape of
    "filter the fact table to rows whose key appears in a driver-side
    predicate set".

    Why not just broadcast the key set (``semi_join_hot_orders``)?  At
    scale the qualifying keys can be 10^8 × 8 B — sending that array to
    every fact task dominates.  The Bloom bitmap is ``m_bits/8`` bytes
    REGARDLESS of key count: each key-side block folds its keys into a
    partial bitmap (k double-hashed bits via splitmix64), the ≤blocks
    partials OR together on the driver (associative, tiny), and the
    fused filter ships once via ``ray.put``.  Fact batches test
    membership fully vectorized; Bloom false positives (~0.6% at 10
    bits/key, k=4) are removed by an EXACT verify so the output equals
    the plain semi join bit-for-bit.  Here the verify is the broadcast
    sorted key array (the small side by contract); when even that is
    too big, verify only the survivors — a hash-partition join whose
    left side the Bloom has already shrunk ~100×.

    Output: ``out_cols`` of the matching fact rows.
    """
    from .sweep import _splitmix64

    words = m_bits // 64

    def _hash_bits(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h1 = _splitmix64(ids.astype(np.int64).view(np.uint64))
        h2 = _splitmix64(h1) | np.uint64(1)
        return h1, h2

    def _partial_bloom(b: pa.Table) -> dict:
        bits = np.zeros(words, dtype=np.uint64)
        ids = b[key_col].to_numpy(zero_copy_only=False)
        h1, h2 = _hash_bits(ids)
        for i in range(k_hashes):
            with np.errstate(over="ignore"):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
            np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
        return pa.table(
            {
                "bloom": pa.array([bits.tobytes()], pa.binary()),
                "ids": pa.array([ids.astype(np.int64).tobytes()], pa.binary()),
            }
        )

    bits = np.zeros(words, dtype=np.uint64)
    id_chunks: list[np.ndarray] = []
    for row in keys.map_batches(_partial_bloom, batch_format="pyarrow").iter_rows():
        bits |= np.frombuffer(row["bloom"], dtype=np.uint64)
        id_chunks.append(np.frombuffer(row["ids"], dtype=np.int64))
    exact = np.unique(np.concatenate(id_chunks or [np.array([], np.int64)]))
    ref = ray.put((bits, exact))

    class _Filter:
        def __init__(self, ref):
            self.bits, self.exact = (
                ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            )

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b[fact_key].to_numpy(zero_copy_only=False)
            h1, h2 = _hash_bits(ids)
            maybe = np.ones(len(ids), dtype=bool)
            for i in range(k_hashes):
                with np.errstate(over="ignore"):
                    pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
                w = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
                maybe &= (w >> (pos & np.uint64(63))) & np.uint64(1) != 0
            if not maybe.any():
                return b.slice(0, 0).select(list(out_cols))
            # exact verify of the (rare) survivors only
            surv = np.flatnonzero(maybe)
            p = np.searchsorted(self.exact, ids[surv])
            p_c = np.minimum(p, max(len(self.exact) - 1, 0))
            hit = (
                self.exact[p_c] == ids[surv]
                if len(self.exact)
                else np.zeros(len(surv), dtype=bool)
            )
            keep = np.zeros(len(ids), dtype=bool)
            keep[surv[hit]] = True
            return b.filter(pa.array(keep)).select(list(out_cols))

    return fact.map_batches(
        _Filter,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


def grouping_sets_counts(
    docs: ray.data.Dataset,
    a_col: str = "source",
    b_col: str = "lang",
    sum_col: str = "n_chars",
    all_label: str = "(all)",
) -> ray.data.Dataset:
    """Multi-granularity aggregate — ``GROUP BY GROUPING SETS ((a, b),
    (a), (b), ())`` — count and int64 sum at every level, with
    ``all_label`` marking the rolled-up dimension (so the schema stays
    null-free and hash-comparable).

    One exchange total: blocks pre-aggregate to the FINEST level (a, b)
    partials; after the small finest groupby, the three coarser levels
    are derived from the finest rows — aggregates over the (a, b)
    domain, dimension-sized, never the fact stream — with three more
    tiny groupbys.  This is the cube-from-partials plan: adding levels
    costs nothing at fact-table scale.

    Output: (a_col, b_col, n_rows, sum_<sum_col>).
    """
    from ray.data.aggregate import Sum

    sum_name = f"sum_{sum_col}"

    def _partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                a_col: b[a_col],
                b_col: b[b_col],
                "n": pa.array(np.ones(len(b), np.int64)),
                "s": pc.cast(b[sum_col], pa.int64()),
            }
        )
        g = t.group_by([a_col, b_col]).aggregate([("n", "sum"), ("s", "sum")])
        return g.rename_columns([a_col, b_col, "n", "s"])

    # materialized: the four output levels all derive from this tiny
    # (a × b domain) table — without it Ray re-executes the fact scan
    # once per union branch
    finest = (
        docs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([a_col, b_col])
        .aggregate(Sum("n"), Sum("s"))
        .materialize()
    )

    def _label(b: pa.Table, a_all: bool, b_all: bool) -> pa.Table:
        n = len(b)
        fill = pa.array([all_label] * n, pa.string())
        return pa.table(
            {
                a_col: fill if a_all else b[a_col],
                b_col: fill if b_all else b[b_col],
                "n_rows": pc.cast(b["sum(n)"], pa.int64()),
                sum_name: pc.cast(b["sum(s)"], pa.int64()),
            }
        )

    fine = finest.map_batches(
        lambda b: _label(b, False, False), batch_format="pyarrow"
    )

    def _re(level_col: str | None):
        if level_col is None:  # grand total
            agg = finest.groupby(None).aggregate(Sum("sum(n)"), Sum("sum(s)"))
        else:
            agg = finest.groupby(level_col).aggregate(Sum("sum(n)"), Sum("sum(s)"))

        def _fmt(b: pa.Table) -> pa.Table:
            n = len(b)
            fill = pa.array([all_label] * n, pa.string())
            return pa.table(
                {
                    a_col: b[a_col] if level_col == a_col else fill,
                    b_col: b[b_col] if level_col == b_col else fill,
                    "n_rows": pc.cast(b["sum(sum(n))"], pa.int64()),
                    sum_name: pc.cast(b["sum(sum(s))"], pa.int64()),
                }
            )

        return agg.map_batches(_fmt, batch_format="pyarrow")

    return fine.union(_re(a_col)).union(_re(b_col)).union(_re(None))


def users_intersect(
    events: ray.data.Dataset,
    type_a: str = "click",
    type_b: str = "purchase",
) -> ray.data.Dataset:
    """Set intersection — users appearing under BOTH event types
    (``INTERSECT`` of the two distinct-user sets), completing the set-op
    family (``union_distinct_users`` / ``broadcast_anti_join``).

    One associative exchange: each block reduces to distinct (user,
    saw_a, saw_b) flag partials (an Arrow hash group-by per batch), the
    global groupby MAX-folds the flags — keys × blocks tiny rows, never
    the event stream — and a final filter keeps users with both flags.

    Output: (user_id,).
    """
    from ray.data.aggregate import Max

    def _partial(b: pa.Table) -> pa.Table:
        et = b["event_type"]
        t = pa.table(
            {
                "user_id": b["user_id"],
                "a": pc.cast(pc.equal(et, type_a), pa.int64()),
                "b": pc.cast(pc.equal(et, type_b), pa.int64()),
            }
        )
        g = t.group_by("user_id").aggregate([("a", "max"), ("b", "max")])
        return g.rename_columns(["user_id", "a", "b"])

    agg = (
        events.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Max("a"), Max("b"))
    )

    def _both(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(b["max(a)"], 1), pc.equal(b["max(b)"], 1))
        return b.filter(keep).select(["user_id"])

    return agg.map_batches(_both, batch_format="pyarrow")


def weighted_sample(
    docs: ray.data.Dataset,
    weight_col: str = "n_chars",
    weight_domain: int = 1024,
) -> ray.data.Dataset:
    """Deterministic WEIGHTED Bernoulli sample — keep probability
    proportional to ``weight_col`` (longer docs kept more often, the
    length-balanced corpus subsample).  The coin is the doc's own
    content hash, so the decision is reproducible on any engine and
    any partitioning: keep iff
    ``uint32(md5(text)[:8]) < weight · 2^32 / weight_domain``, an
    integer compare both sides of the SQL oracle state identically
    (the SQL compares fixed-width lowercase hex strings, which orders
    the same as the integers).  Stateless per-row math — no exchange
    at all.  Output: (doc_id, source, n_chars).
    """
    import hashlib

    scale = (1 << 32) // int(weight_domain)

    def _keep(b: pa.Table) -> pa.Table:
        h = np.array(
            [
                int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16)
                for t in b["text"].to_pylist()
            ],
            dtype=np.int64,
        )
        w = pc.cast(b[weight_col], pa.int64()).to_numpy(zero_copy_only=False)
        keep = h < w * np.int64(scale)
        return b.filter(pa.array(keep)).select(["doc_id", "source", "n_chars"])

    return docs.map_batches(_keep, batch_format="pyarrow", zero_copy_batch=True)


def funnel_users(
    events: ray.data.Dataset,
    step_a: str = "click",
    step_b: str = "purchase",
) -> ray.data.Dataset:
    """Ordered two-step funnel — users whose FIRST ``step_a`` strictly
    precedes their FIRST ``step_b`` (conversion analysis; the sequence
    predicate every product-analytics pipeline needs).

    Entirely associative: each block emits per-user partial
    (min ts_a, min ts_b) with +inf sentinels for absent steps; one
    small groupby MIN-folds the partials and the comparison is a
    vectorized int64 filter — the event stream itself is never
    shuffled.  Tie (same timestamp) does not count as before, matching
    the strict ``<`` of the SQL oracle.  Output: (user_id, first_a_us,
    first_b_us).
    """
    from ray.data.aggregate import Min

    BIG = np.int64(np.iinfo(np.int64).max)

    def _partial(b: pa.Table) -> pa.Table:
        et = b["event_type"]
        tsv = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        is_a = pc.equal(et, step_a).to_numpy(zero_copy_only=False)
        is_b = pc.equal(et, step_b).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "user_id": b["user_id"],
                "ta": pa.array(np.where(is_a, tsv, BIG), pa.int64()),
                "tb": pa.array(np.where(is_b, tsv, BIG), pa.int64()),
            }
        )
        g = t.group_by("user_id").aggregate([("ta", "min"), ("tb", "min")])
        return g.rename_columns(["user_id", "ta", "tb"])

    agg = (
        events.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Min("ta"), Min("tb"))
    )

    def _conv(b: pa.Table) -> pa.Table:
        ta = b["min(ta)"].to_numpy(zero_copy_only=False)
        tb = b["min(tb)"].to_numpy(zero_copy_only=False)
        keep = (ta < tb) & (tb != BIG)
        out = pa.table(
            {
                "user_id": b["user_id"],
                "first_a_us": pa.array(ta, pa.int64()),
                "first_b_us": pa.array(tb, pa.int64()),
            }
        )
        return out.filter(pa.array(keep))

    return agg.map_batches(_conv, batch_format="pyarrow")


def pricing_summary(
    lineitem: ray.data.Dataset,
    ship_cutoff_us: int = 946_684_800_000_000,  # 2000-01-01 UTC
) -> ray.data.Dataset:
    """TPC-H Q1-shaped pricing summary — per (returnflag, linestatus):
    quantity/base/discounted/charged totals and their means, over rows
    shipped on or before the cutoff.

    Exact integer arithmetic end-to-end: prices in cents, discount and
    tax in integer percent, so ``disc_price = cents·(100−d)`` (scale
    10^-4 dollars) and ``charge = cents·(100−d)·(100+t)`` (10^-6) are
    exact int64 partial sums combined associatively; each mean is ONE
    int/int float division at the end (max |charge| term ≈ 1.1e11/row
    → int64-safe to ~8e7 rows/group; beyond that split the sum into
    hi/lo limbs as in ``window.grouped_stats``).  One tiny exchange of
    per-block (flag, status) partials.
    """
    from ray.data.aggregate import Sum

    def _partial(b: pa.Table) -> pa.Table:
        ship = pc.cast(b["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = ship <= ship_cutoff_us
        b = b.filter(pa.array(keep))
        cents = (
            pc.cast(pc.round(pc.multiply(b["l_extendedprice"], 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        qty = pc.cast(b["l_quantity"], pa.int64()).to_numpy(zero_copy_only=False)
        d = (
            pc.cast(pc.round(pc.multiply(b["l_discount"], 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        t_ = (
            pc.cast(pc.round(pc.multiply(b["l_tax"], 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        disc_price = cents * (100 - d)
        charge = disc_price * (100 + t_)
        tbl = pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "q": pa.array(qty),
                "base": pa.array(cents),
                "dp": pa.array(disc_price),
                "ch": pa.array(charge),
                "disc": pa.array(d),
                "n": pa.array(np.ones(len(b), np.int64)),
            }
        )
        g = tbl.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("q", "sum"), ("base", "sum"), ("dp", "sum"),
             ("ch", "sum"), ("disc", "sum"), ("n", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "q", "base", "dp", "ch", "disc", "n"]
        )

    agg = (
        lineitem.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("q"), Sum("base"), Sum("dp"), Sum("ch"), Sum("disc"), Sum("n"))
    )

    def _finish(b: pa.Table) -> pa.Table:
        f = lambda c: b[c].to_numpy(zero_copy_only=False).astype(np.int64)  # noqa: E731
        q, base, dp = f("sum(q)"), f("sum(base)"), f("sum(dp)")
        ch, disc, n = f("sum(ch)"), f("sum(disc)"), f("sum(n)")
        nf = n.astype(np.float64)
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "sum_qty": pa.array(q, pa.int64()),
                "sum_base_cents": pa.array(base, pa.int64()),
                "sum_disc_price_e4": pa.array(dp, pa.int64()),
                "sum_charge_e6": pa.array(ch, pa.int64()),
                "avg_qty": pa.array(q.astype(np.float64) / nf, pa.float64()),
                "avg_price_cents": pa.array(base.astype(np.float64) / nf, pa.float64()),
                "avg_disc_pct": pa.array(disc.astype(np.float64) / nf, pa.float64()),
                "n_rows": pa.array(n, pa.int64()),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def shipping_priority_topk(
    customer: ray.data.Dataset,
    orders: ray.data.Dataset,
    lineitem: ray.data.Dataset,
    segment: str = "BUILDING",
    cutoff_us: int = 883_612_800_000_000,  # 1998-01-01 UTC
    k: int = 10,
) -> ray.data.Dataset:
    """TPC-H Q3-shaped composition — top-k unshipped orders of one
    market segment by discounted revenue: customer ⋈ orders ⋈ lineitem
    with the date window split across the two fact filters.

    Join strategy by side size, composed from this module's
    primitives: the segment's customers broadcast once (dimension
    side); qualifying orders reduce to a broadcast (orderkey →
    orderdate) map (bounded by the segment×window selectivity — for a
    window where this side is fact-sized, swap the broadcast for
    ``hash_bucket_join``, same semantics); lineitem then streams with
    one membership filter + per-block revenue partials keyed on
    orderkey, an associative groupby-sum, and a k×blocks top-k merge.
    Revenue is exact: cents·(100−disc) int64 (scale 10^-4 dollars).
    Output: (o_orderkey, o_orderdate, revenue_e4), top-k by
    (revenue desc, orderkey asc).
    """
    from ray.data.aggregate import Sum

    seg = customer.filter(expr=f"c_mktsegment == '{segment}'")
    custs = np.unique(
        np.concatenate(
            [
                b["c_custkey"].to_numpy(zero_copy_only=False)
                for b in seg.iter_batches(batch_size=None, batch_format="pyarrow")
            ]
            or [np.array([], np.int64)]
        )
    )
    cref = ray.put(custs)

    _cache: dict = {}

    def _orders_pick(b: pa.Table) -> pa.Table:
        cs = _cache.get("c")
        if cs is None:
            cs = ray.get(cref)
            _cache["c"] = cs
        ok = pc.cast(b["o_custkey"], pa.int64()).to_numpy(zero_copy_only=False)
        od = pc.cast(b["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(cs, ok), max(len(cs) - 1, 0))
        keep = (cs[pos] == ok) if len(cs) else np.zeros(len(ok), bool)
        keep &= od < cutoff_us
        return b.filter(pa.array(keep)).select(["o_orderkey", "o_orderdate"])

    o_rows: list[pa.Table] = []
    for b in (
        orders.map_batches(_orders_pick, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ):
        o_rows.append(b)
    o_tbl = pa.concat_tables(o_rows) if o_rows else None
    if o_tbl is None or len(o_tbl) == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_orderdate": pa.array([], pa.timestamp("us")),
                    "revenue_e4": pa.array([], pa.int64()),
                }
            )
        )
    okeys = o_tbl["o_orderkey"].to_numpy(zero_copy_only=False)
    odates = pc.cast(o_tbl["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
    order_sort = np.argsort(okeys, kind="stable")
    okeys_s, odates_s = okeys[order_sort], odates[order_sort]
    oref = ray.put((okeys_s, odates_s))

    def _li_partial(b: pa.Table) -> pa.Table:
        got = _cache.get("o")
        if got is None:
            got = ray.get(oref)
            _cache["o"] = got
        keys, _dates = got
        lk = pc.cast(b["l_orderkey"], pa.int64()).to_numpy(zero_copy_only=False)
        sd = pc.cast(b["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(keys, lk), max(len(keys) - 1, 0))
        keep = (keys[pos] == lk) if len(keys) else np.zeros(len(lk), bool)
        keep &= sd > cutoff_us
        b = b.filter(pa.array(keep))
        cents = (
            pc.cast(pc.round(pc.multiply(b["l_extendedprice"], 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        d = (
            pc.cast(pc.round(pc.multiply(b["l_discount"], 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "o_orderkey": b["l_orderkey"],
                "rev": pa.array(cents * (100 - d), pa.int64()),
            }
        )
        g = t.group_by("o_orderkey").aggregate([("rev", "sum")])
        return g.rename_columns(["o_orderkey", "rev"])

    agg = (
        lineitem.map_batches(_li_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderkey")
        .aggregate(Sum("rev"))
    )

    def _attach_date(b: pa.Table) -> pa.Table:
        got = _cache.get("o")
        if got is None:
            got = ray.get(oref)
            _cache["o"] = got
        keys, dates = got
        ok = pc.cast(b["o_orderkey"], pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, ok)
        return pa.table(
            {
                "o_orderkey": pa.array(ok, pa.int64()),
                "o_orderdate": pa.array(dates[pos], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "revenue_e4": pc.cast(b["sum(rev)"], pa.int64()),
            }
        )

    out = agg.map_batches(_attach_date, batch_format="pyarrow")
    return out.sort(
        ["revenue_e4", "o_orderkey"], descending=[True, False]
    ).limit(k)


def local_supplier_revenue(
    customer: ray.data.Dataset,
    orders: ray.data.Dataset,
    lineitem: ray.data.Dataset,
    supplier: ray.data.Dataset,
    nation: ray.data.Dataset,
    region: ray.data.Dataset,
    region_name: str = "ASIA",
    date_lo_us: int = 820_454_400_000_000,  # 1996-01-01 UTC
    date_hi_us: int = 852_076_800_000_000,  # 1997-01-01 UTC
) -> ray.data.Dataset:
    """TPC-H Q5-shaped five-way composition — revenue per nation from
    LOCAL supply chains (customer and supplier in the same nation of
    one region, orders in a one-year window).  Join strategy by side
    size, composed from this module's primitives exactly like
    :func:`shipping_priority_topk`: nation⋈region and supplier are
    dimensions (driver-collected, broadcast once); the windowed
    region-customer orders reduce to a broadcast (orderkey →
    customer-nation) map — bounded by the window×region selectivity;
    for a window where this side is fact-sized, swap the broadcast for
    ``hash_bucket_join``, same semantics — and lineitem streams with
    two sorted-array lookups, the locality filter, and per-block
    int64 revenue partials keyed on the nation (domain-bounded
    exchange).  Revenue is exact cents·(100−disc) int64; the dollar
    column is one f8/1e4 division.

    Output: (n_name, revenue_e4, revenue) per region nation with
    qualifying rows.
    """
    from ray.data.aggregate import Sum

    def _collect(ds: ray.data.Dataset) -> pa.Table | None:
        rows = [
            b
            for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
            if len(b)
        ]
        return pa.concat_tables(rows) if rows else None

    reg = _collect(region.filter(expr=f"r_name == '{region_name}'"))
    nat = _collect(nation)
    if reg is None or nat is None:
        raise ValueError("local_supplier_revenue: empty region/nation dims")
    rkey = reg["r_regionkey"][0].as_py()
    nmask = pc.equal(nat["n_regionkey"], rkey)
    nat_r = nat.filter(nmask)
    nkeys = nat_r["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nnames = nat_r["n_name"].to_pylist()
    nsort = np.argsort(nkeys, kind="stable")
    nkeys_s = nkeys[nsort]
    nname_by_key = {int(k): nnames[i] for i, k in zip(nsort, nkeys_s)}

    sup = _collect(supplier.select_columns(["s_suppkey", "s_nationkey"]))
    skeys = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    snat = sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    ssort = np.argsort(skeys, kind="stable")
    skeys_s, snat_s = skeys[ssort], snat[ssort]

    # region customers: (c_custkey -> c_nationkey), streamed filter
    def _cust_pick(b: pa.Table) -> pa.Table:
        cn = pc.cast(b["c_nationkey"], pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(nkeys_s, cn), max(len(nkeys_s) - 1, 0))
        keep = (nkeys_s[pos] == cn) if len(nkeys_s) else np.zeros(len(cn), bool)
        return b.filter(pa.array(keep)).select(["c_custkey", "c_nationkey"])

    cust = _collect(
        customer.map_batches(_cust_pick, batch_format="pyarrow", zero_copy_batch=True)
    )
    empty = pa.table(
        {
            "n_name": pa.array([], pa.string()),
            "revenue_e4": pa.array([], pa.int64()),
            "revenue": pa.array([], pa.float64()),
        }
    )
    if cust is None or len(cust) == 0:
        return ray.data.from_arrow(empty)
    ckeys = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnat = cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    csort = np.argsort(ckeys, kind="stable")
    ckeys_s, cnat_s = ckeys[csort], cnat[csort]
    cref = ray.put((ckeys_s, cnat_s))

    _cache: dict = {}

    def _orders_pick(b: pa.Table) -> pa.Table:
        if "c" not in _cache:
            _cache["c"] = ray.get(cref)
        ck, cn = _cache["c"]
        ok = pc.cast(b["o_custkey"], pa.int64()).to_numpy(zero_copy_only=False)
        od = pc.cast(b["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(ck, ok), max(len(ck) - 1, 0))
        keep = (ck[pos] == ok) if len(ck) else np.zeros(len(ok), bool)
        keep &= (od >= date_lo_us) & (od < date_hi_us)
        t = b.filter(pa.array(keep))
        pos = pos[keep]
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "cust_nat": pa.array(cn[pos] if len(ck) else np.array([], np.int64)),
            }
        )

    o_tbl = _collect(
        orders.map_batches(_orders_pick, batch_format="pyarrow", zero_copy_batch=True)
    )
    if o_tbl is None or len(o_tbl) == 0:
        return ray.data.from_arrow(empty)
    okeys = o_tbl["o_orderkey"].to_numpy(zero_copy_only=False)
    onat = o_tbl["cust_nat"].to_numpy(zero_copy_only=False)
    osort = np.argsort(okeys, kind="stable")
    oref = ray.put((okeys[osort], onat[osort], skeys_s, snat_s))

    def _li_partial(b: pa.Table) -> pa.Table:
        if "o" not in _cache:
            _cache["o"] = ray.get(oref)
        ok_s, on_s, sk_s, sn_s = _cache["o"]
        lk = pc.cast(b["l_orderkey"], pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(ok_s, lk), max(len(ok_s) - 1, 0))
        keep = ok_s[pos] == lk
        t = b.filter(pa.array(keep))
        if len(t) == 0:
            return pa.table(
                {"nationkey": pa.array([], pa.int64()), "rev": pa.array([], pa.int64())}
            )
        cust_n = on_s[pos[keep]]
        ls = pc.cast(t["l_suppkey"], pa.int64()).to_numpy(zero_copy_only=False)
        spos = np.minimum(np.searchsorted(sk_s, ls), max(len(sk_s) - 1, 0))
        smatch = sk_s[spos] == ls
        local = smatch & (sn_s[spos] == cust_n)
        t2 = t.filter(pa.array(local))
        if len(t2) == 0:
            return pa.table(
                {"nationkey": pa.array([], pa.int64()), "rev": pa.array([], pa.int64())}
            )
        cents = pc.cast(
            pc.round(pc.multiply(t2["l_extendedprice"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        disc = pc.cast(
            pc.round(pc.multiply(t2["l_discount"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        rev = cents * (np.int64(100) - disc)
        part = pa.table(
            {"nationkey": pa.array(cust_n[local]), "rev": pa.array(rev)}
        )
        g = part.group_by("nationkey").aggregate([("rev", "sum")])
        return g.rename_columns(["nationkey", "rev"])

    agg = (
        lineitem.map_batches(_li_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("nationkey")
        .aggregate(Sum("rev"))
    )

    def _finish(b: pa.Table) -> pa.Table:
        nk = pc.cast(b["nationkey"], pa.int64()).to_numpy(zero_copy_only=False)
        rev = pc.cast(b["sum(rev)"], pa.int64()).to_numpy(zero_copy_only=False)
        names = [nname_by_key[int(k)] for k in nk]
        return pa.table(
            {
                "n_name": pa.array(names, pa.string()),
                "revenue_e4": pa.array(rev),
                "revenue": pa.array(
                    rev.astype(np.float64) / np.float64(10_000.0), pa.float64()
                ),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def above_avg_customers(
    customer: ray.data.Dataset,
) -> ray.data.Dataset:
    """Decorrelated scalar-subquery pattern (TPC-H Q22's shape):
    customers strictly above their nation's average balance, WITHOUT
    dividing — the comparison ``bal > avg`` becomes the exact integer
    cross-multiplication ``bal_cents · n > Σbal_cents``, so the whole
    query is int64 and hash-exact.  Two passes over the dimension-thin
    projection: nation partials aggregate to a 25-row table broadcast
    into the second streamed pass (the canonical decorrelation — the
    inner aggregate becomes a build side, never a per-row re-scan).

    Output: (n_nationkey, n_customers, sum_bal_cents, n_above).
    """
    from ray.data.aggregate import Sum

    def _partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["c_acctbal"], 100.0)), pa.int64())
        t = pa.table(
            {
                "n_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
                "n": pa.array(np.ones(len(b), np.int64)),
                "sb": cents,
            }
        )
        g = t.group_by("n_nationkey").aggregate([("n", "sum"), ("sb", "sum")])
        return g.rename_columns(["n_nationkey", "n", "sb"])

    stats = (
        customer.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_nationkey")
        .aggregate(Sum("n"), Sum("sb"))
    )
    rows = [
        b
        for b in stats.iter_batches(batch_size=None, batch_format="pyarrow")
        if len(b)
    ]
    if not rows:
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_nationkey": pa.array([], pa.int64()),
                    "n_customers": pa.array([], pa.int64()),
                    "sum_bal_cents": pa.array([], pa.int64()),
                    "n_above": pa.array([], pa.int64()),
                }
            )
        )
    st = pa.concat_tables(rows)
    keys = pc.cast(st["n_nationkey"], pa.int64()).to_numpy(zero_copy_only=False)
    ns = pc.cast(st["sum(n)"], pa.int64()).to_numpy(zero_copy_only=False)
    sbs = pc.cast(st["sum(sb)"], pa.int64()).to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    sref = ray.put((keys[order], ns[order], sbs[order]))

    _cache: dict = {}

    def _above_partial(b: pa.Table) -> pa.Table:
        if "s" not in _cache:
            _cache["s"] = ray.get(sref)
        ks, nn, sb = _cache["s"]
        nk = pc.cast(b["c_nationkey"], pa.int64()).to_numpy(zero_copy_only=False)
        cents = pc.cast(
            pc.round(pc.multiply(b["c_acctbal"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(ks, nk), max(len(ks) - 1, 0))
        above = (cents * nn[pos] > sb[pos]) & (ks[pos] == nk)
        t = pa.table(
            {
                "n_nationkey": pa.array(nk),
                "a": pa.array(above.astype(np.int64)),
            }
        )
        g = t.group_by("n_nationkey").aggregate([("a", "sum")])
        return g.rename_columns(["n_nationkey", "a"])

    above = (
        customer.map_batches(
            _above_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("n_nationkey")
        .aggregate(Sum("a"))
    )

    lut = {int(k): (int(n), int(s)) for k, n, s in zip(keys, ns, sbs)}

    def _finish(b: pa.Table) -> pa.Table:
        nk = pc.cast(b["n_nationkey"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_nationkey": pa.array(nk),
                "n_customers": pa.array(
                    np.array([lut[int(k)][0] for k in nk], np.int64)
                ),
                "sum_bal_cents": pa.array(
                    np.array([lut[int(k)][1] for k in nk], np.int64)
                ),
                "n_above": pc.cast(b["sum(a)"], pa.int64()),
            }
        )

    return above.map_batches(_finish, batch_format="pyarrow")


def custdist_hist(
    customer: ray.data.Dataset,
    orders: ray.data.Dataset,
    exclude_status: str = "F",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Customer-distribution histogram (TPC-H Q13's shape): how many
    customers placed exactly k qualifying orders, INCLUDING the
    zero-order customers a plain groupby over orders can never see —
    the left-outer count-of-counts.

    Scale shape: orders pre-aggregate to per-custkey counts (per-block
    partials → one keyed exchange, so the fact table never ships raw
    rows); customer keys and the count rows then co-partition into ONE
    ``custkey % n_buckets`` groupby where a vectorized sorted-merge
    assigns each customer its count (missing → 0) and emits a
    histogram PARTIAL per bucket — the final exchange is
    count-domain-sized (a few dozen rows), never customer-sized.
    ``c_custkey`` is assumed unique (primary key), like
    :func:`hash_bucket_join`'s right side.

    Reference parity: the reference has no relational layer; this is
    SURVEY §2 join/aggregate breadth (the Q13 companion to the Q22
    shape in :func:`above_avg_customers`).

    Output: (c_count, custdist).
    """
    from ray.data.aggregate import Sum

    def _cnt_partial(b: pa.Table) -> pa.Table:
        m = pc.not_equal(b["o_orderstatus"], exclude_status)
        k = pc.cast(b["o_custkey"].filter(m), pa.int64())
        t = pa.table({"ck": k, "n": pa.array(np.ones(len(k), np.int64))})
        g = t.group_by("ck").aggregate([("n", "sum")])
        return g.rename_columns(["ck", "n"])

    counts = (
        orders.map_batches(_cnt_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ck")
        .aggregate(Sum("n"))
    )

    def _bucket_of(k: pa.Array) -> pa.Array:
        if (n_buckets & (n_buckets - 1)) == 0:
            return pc.cast(pc.bit_wise_and(k, n_buckets - 1), pa.int32())
        return pa.array(
            np.mod(k.to_numpy(zero_copy_only=False), n_buckets).astype(np.int32)
        )

    def _tag_cust(b: pa.Table) -> pa.Table:
        k = pc.cast(b["c_custkey"], pa.int64())
        return pa.table(
            {
                "ck": k,
                "n": pa.array(np.zeros(len(b), np.int64)),
                "__kind": pa.array(np.ones(len(b), np.int8)),
                "__bucket": _bucket_of(k),
            }
        )

    def _tag_counts(b: pa.Table) -> pa.Table:
        k = pc.cast(b["ck"], pa.int64())
        return pa.table(
            {
                "ck": k,
                "n": pc.cast(b["sum(n)"], pa.int64()),
                "__kind": pa.array(np.zeros(len(b), np.int8)),
                "__bucket": _bucket_of(k),
            }
        )

    tagged = customer.select_columns(["c_custkey"]).map_batches(
        _tag_cust, batch_format="pyarrow", zero_copy_batch=True
    ).union(counts.map_batches(_tag_counts, batch_format="pyarrow"))

    def _bucket_hist(g: pa.Table) -> pa.Table:
        kind = g["__kind"].to_numpy(zero_copy_only=False)
        ck = g["ck"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        K = np.sort(ck[kind == 1])
        C, N = ck[kind == 0], n[kind == 0]
        if len(K) == 0:
            return pa.table(
                {
                    "c_count": pa.array([], pa.int64()),
                    "custdist": pa.array([], pa.int64()),
                }
            )
        if len(C):
            pos = np.searchsorted(K, C)
            pos[pos == len(K)] = 0
            inK = K[pos] == C  # LEFT-join semantics: drop orphan orders
            C, N = C[inK], N[inK]
        vals, cnts = np.unique(N, return_counts=True)
        zeros = np.int64(len(K) - len(C))
        if zeros > 0:
            vals = np.r_[np.int64(0), vals]
            cnts = np.r_[zeros, cnts.astype(np.int64)]
        return pa.table(
            {
                "c_count": pa.array(vals.astype(np.int64)),
                "custdist": pa.array(cnts.astype(np.int64)),
            }
        )

    hist = (
        tagged.groupby("__bucket")
        .map_groups(_bucket_hist, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("custdist"))
    )

    def _finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_count": pc.cast(b["c_count"], pa.int64()),
                "custdist": pc.cast(b["sum(custdist)"], pa.int64()),
            }
        )

    return hist.map_batches(_finish, batch_format="pyarrow")


def session_duration_hist(
    events: ray.data.Dataset,
    gap_s: int = 1800,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Distribution of session DURATIONS (last−first event, µs) across
    all users, in exact power-of-two buckets — the "how long do
    sessions actually run" histogram a capacity planner reads next to
    :func:`sessionize`'s per-user counts.  bucket = bit_length(dur)
    for dur > 0 (the `inter_arrival_hist` frexp trick — exact, no
    float log), bucket 0 for zero-duration (single-event or
    same-timestamp) sessions.

    Scale shape: the exchange carries only (user_id, ts) keyed on
    hash(user) % num_partitions; each sweep computes every contained
    user's sessions with diff/reduceat kernels and emits a ≤64-row
    histogram PARTIAL, so the final exchange is bucket-domain-sized.
    Session assignment and duration are tie-order-insensitive (equal
    timestamps give zero gaps wherever they sort), so the driver hash
    is stable under any partitioning.

    Output: (bucket, n_sessions).
    """
    from ray.data.aggregate import Sum

    from .sweep import run_starts_table, with_part

    gap_us = gap_s * US

    def _route(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"user_id": b["user_id"], "ts": pc.cast(b["ts"], pa.int64())}
        )
        return with_part(t, ["user_id"], num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "n_sessions": pa.array([], pa.int64()),
            }
        )
        n = len(g)
        if n == 0:
            return empty
        idx = pc.sort_indices(
            g, sort_keys=[("user_id", "ascending"), ("ts", "ascending")]
        )
        g = g.take(idx)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        ustarts = run_starts_table(g, ["user_id"])
        new_s = np.zeros(n, dtype=bool)
        new_s[1:] = (ts[1:] - ts[:-1]) > gap_us
        new_s[ustarts] = True
        sess_starts = np.flatnonzero(new_s)
        sess_ends = np.r_[sess_starts[1:], n] - 1
        dur = ts[sess_ends] - ts[sess_starts]
        if dur.max(initial=0) >= (np.int64(1) << np.int64(53)):
            raise ValueError(
                "session_duration_hist: duration exceeds 2**53 µs — the "
                "float64 frexp bucket trick stops being exact; bucket in "
                "integer bit_length instead"
            )
        # exact power-of-two bucket: bit_length(dur) == frexp exponent
        _, expo = np.frexp(dur.astype(np.float64))
        bucket = np.where(dur > 0, expo.astype(np.int64), np.int64(0))
        vals, cnts = np.unique(bucket, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(vals.astype(np.int64)),
                "n_sessions": pa.array(cnts.astype(np.int64)),
            }
        )

    routed = events.map_batches(_route, batch_format="pyarrow", zero_copy_batch=True)
    hist = (
        routed.groupby("__part")
        .map_groups(_sweep, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_sessions"))
    )

    def _finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": pc.cast(b["bucket"], pa.int64()),
                "n_sessions": pc.cast(b["sum(n_sessions)"], pa.int64()),
            }
        )

    return hist.map_batches(_finish, batch_format="pyarrow")


def minmax_scale_per_source(
    events: ray.data.Dataset,
) -> ray.data.Dataset:
    """Feature scaling — the normalize-before-training transform: every
    event's value rescaled to [0, 1] within its source via
    ``(c − min) / (max − min)`` on integer cents.  Two passes, the
    :func:`above_avg_customers` decorrelation shape: per-source min/max
    aggregate to a source-domain-sized table `ray.put` ONCE, then one
    streamed map over the fact rows does the pinned arithmetic (both
    int64 diffs convert to f8 exactly, one division) — no fact-side
    shuffle.  Degenerate sources (max == min) are filtered with the
    integer comparison the SQL mirrors.

    Output: (event_id, source, cents, scaled).
    """
    from ray.data.aggregate import Max, Min

    def _proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["event_type"],
                "c": pc.cast(pc.round(pc.multiply(b["value"], 100.0)), pa.int64()),
            }
        )

    stats = (
        events.map_batches(_proj, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Min("c"), Max("c"))
    )
    rows = [
        b
        for b in stats.iter_batches(batch_size=None, batch_format="pyarrow")
        if len(b)
    ]
    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "source": pa.array([], pa.string()),
            "cents": pa.array([], pa.int64()),
            "scaled": pa.array([], pa.float64()),
        }
    )
    if not rows:
        return ray.data.from_arrow(empty)
    st = pa.concat_tables(rows)
    keys = np.asarray(st["source"].to_pylist(), dtype=object)
    mns = pc.cast(st["min(c)"], pa.int64()).to_numpy(zero_copy_only=False)
    mxs = pc.cast(st["max(c)"], pa.int64()).to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    sref = ray.put((keys[order], mns[order], mxs[order]))

    _cache: dict = {}

    def _scale(b: pa.Table) -> pa.Table:
        if "s" not in _cache:
            _cache["s"] = ray.get(sref)
        k, mn, mx = _cache["s"]
        if len(b) == 0:
            return empty
        src = np.asarray(b["event_type"].to_pylist(), dtype=object)
        c = (
            pc.cast(pc.round(pc.multiply(b["value"], 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        pos = np.searchsorted(k, src)
        pos[pos == len(k)] = 0
        ok = k[pos] == src
        lo, hi = mn[pos], mx[pos]
        keep = ok & (hi > lo)
        if not keep.any():
            return empty
        f = np.float64
        scaled = (c[keep] - lo[keep]).astype(f) / (hi[keep] - lo[keep]).astype(f)
        return pa.table(
            {
                "event_id": pc.cast(b["event_id"], pa.int64()).filter(
                    pa.array(keep)
                ),
                "source": b["event_type"].filter(pa.array(keep)),
                "cents": pa.array(c[keep]),
                "scaled": pa.array(scaled),
            }
        )

    return events.map_batches(_scale, batch_format="pyarrow", zero_copy_batch=True)


def nearest_event_join(
    events: ray.data.Dataset,
    left_type: str = "purchase",
    right_type: str = "click",
    max_gap_s: int = 600,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """NEAREST-neighbor time join — the missing sibling of the backward
    as-of join: for every left event, the right event of the SAME user
    closest in time (either direction) within ±max_gap.  Attribution
    queries ("which click is this purchase closest to") need nearest,
    not last-before.

    Tie rule, pinned identically in the SQL oracle: smaller |Δt| wins;
    equidistant → the EARLIER right timestamp; equal timestamps → the
    smaller right event_id.

    Scale shape: both sides route into ONE hash(user) % P exchange
    (the as-of tagged-union pattern); each sweep encodes (user-run,
    sweep-relative ts) as a composite int64 (`range_join`'s idiom, with
    the same loud overflow guard) so TWO searchsorted calls find every
    left row's flanking candidates across all users at once — no
    per-user Python loop.  Equal-timestamp candidate groups resolve to
    their min event_id via a third searchsorted against the group key.

    Output: (event_id, user_id, near_event_id, delta_us) — delta
    signed (negative = nearest right is earlier).
    """
    from .sweep import run_starts_table, with_part

    gap_us = np.int64(max_gap_s * US)

    def _route(b: pa.Table) -> pa.Table:
        kind = pc.cast(pc.equal(b["event_type"], left_type), pa.int8())
        keep = pc.or_(
            pc.equal(b["event_type"], left_type),
            pc.equal(b["event_type"], right_type),
        )
        t = pa.table(
            {
                "user_id": b["user_id"],
                "ts": pc.cast(b["ts"], pa.int64()),
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "kind": kind,
            }
        ).filter(keep)
        return with_part(t, ["user_id"], num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "near_event_id": pa.array([], pa.int64()),
                "delta_us": pa.array([], pa.int64()),
            }
        )
        n = len(g)
        if n == 0:
            return empty
        idx = pc.sort_indices(g, sort_keys=[("user_id", "ascending")])
        g = g.take(idx)
        ustarts = run_starts_table(g, ["user_id"])
        uidx_all = (
            np.searchsorted(ustarts, np.arange(n, dtype=np.int64), side="right") - 1
        )
        ts = g["ts"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        uid = pc.cast(g["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
        kind = g["kind"].to_numpy(zero_copy_only=False)
        base = ts.min()
        rel = ts - base
        span = np.int64(1) << np.int64(max(int(rel.max()).bit_length() + 1, 1))
        if len(ustarts) * int(span) >= (1 << 62):
            raise ValueError(
                "nearest_event_join: user-runs × ts-span exceeds int64 "
                "composite headroom — raise num_partitions"
            )
        isL = kind == 1
        lu, lt, lid = uidx_all[isL], rel[isL], eid[isL]
        ru, rt, rid = uidx_all[~isL], rel[~isL], eid[~isL]
        luid = uid[isL]
        if len(lt) == 0 or len(rt) == 0:
            return empty
        order = np.lexsort((rid, rt, ru))
        ru, rt, rid = ru[order], rt[order], rid[order]
        rc = ru * span + rt
        lc = lu * span + lt
        pos = np.searchsorted(rc, lc, side="left")
        m = len(rc)
        # candidate B: first right with rt >= t in the same user run
        bi = np.clip(pos, 0, m - 1)
        b_ok = (pos < m) & (ru[bi] == lu)
        # candidate A: last right with rt < t → resolve its equal-ts
        # group to the group START (min event_id)
        ai_last = np.clip(pos - 1, 0, m - 1)
        a_ok = (pos > 0) & (ru[ai_last] == lu)
        ai = np.searchsorted(rc, rc[ai_last], side="left")
        dA = lt - rt[ai]  # > 0 where valid
        dB = rt[bi] - lt  # >= 0 where valid
        BIGD = np.int64(1) << np.int64(62)
        absA = np.where(a_ok, dA, BIGD)
        absB = np.where(b_ok, dB, BIGD)
        takeA = absA <= absB  # equidistant -> earlier right ts (A)
        near = np.where(takeA, rid[ai], rid[bi])
        delta = np.where(takeA, -dA, dB)
        valid = (a_ok | b_ok) & (np.minimum(absA, absB) <= gap_us)
        if not valid.any():
            return empty
        return pa.table(
            {
                "event_id": pa.array(lid[valid]),
                "user_id": pa.array(luid[valid]),
                "near_event_id": pa.array(near[valid]),
                "delta_us": pa.array(delta[valid]),
            }
        )

    routed = events.map_batches(_route, batch_format="pyarrow", zero_copy_batch=True)
    return routed.groupby("__part").map_groups(_sweep, batch_format="pyarrow")


def returned_revenue_topn(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    k: int = 20,
    n_buckets: int = 64,
) -> pa.Table:
    """TPC-H Q10-shaped returned-item revenue ranking: the top-k
    customers by revenue lost to returns (``l_returnflag = 'R'``),
    revenue exact int64 ``cents × (100 − disc)`` units (same pinned
    arithmetic as :func:`local_supplier_revenue` — no float sums, so
    the ranking and the hash gate are exact).

    Execution shape for the 100 TB case:

    1. lineitem streams: filter to returns, per-block partial revenue
       sums keyed on l_orderkey — the join input shrinks to ≤ one row
       per (block, orderkey) before anything moves;
    2. orderkey → custkey via :func:`hash_bucket_join` (both sides
       fact-sized — a dimension broadcast would not survive 100 TB);
    3. revenue per customer via ONE keyed groupby-sum (customer-domain
       sized);
    4. top-k: per-block partial top-k, driver combine of ≤ blocks × k
       rows (bounded), then the k winner custkeys broadcast back to
       filter the streaming customer table for names — never a
       customer-table collect.

    Ties broken by ascending custkey, pinned in SQL via row_number.

    Output: pa.Table (c_custkey, c_name, revenue_units) sorted by
    revenue desc, custkey asc — k rows.
    """
    from ray.data.aggregate import Sum

    def _li_partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["l_returnflag"], "R"))
        if len(t) == 0:
            return pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "rev": pa.array([], pa.int64()),
                }
            )
        cents = pc.cast(
            pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        disc = pc.cast(
            pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        part = pa.table(
            {
                "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "rev": pa.array(cents * (np.int64(100) - disc)),
            }
        )
        g = part.group_by("l_orderkey").aggregate([("rev", "sum")])
        return g.rename_columns(["l_orderkey", "rev"])

    li = lineitem.map_batches(
        _li_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def _orders_key(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "o_custkey": pc.cast(b["o_custkey"], pa.int64()),
            }
        )

    joined = hash_bucket_join(
        li,
        orders.map_batches(_orders_key, batch_format="pyarrow"),
        key="l_orderkey",
        left_carry=("rev",),
        right_carry=("o_custkey",),
        n_buckets=n_buckets,
    )
    per_cust = joined.groupby("o_custkey").aggregate(Sum("rev"))

    def _topk_partial(b: pa.Table) -> pa.Table:
        ck = pc.cast(b["o_custkey"], pa.int64()).to_numpy(zero_copy_only=False)
        rv = pc.cast(b["sum(rev)"], pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ck, -rv))[: k]
        return pa.table(
            {
                "c_custkey": pa.array(ck[order]),
                "revenue_units": pa.array(rv[order]),
            }
        )

    parts = [
        t
        for t in per_cust.map_batches(
            _topk_partial, batch_format="pyarrow"
        ).iter_batches(batch_size=None, batch_format="pyarrow")
        if len(t)
    ]
    if not parts:
        return pa.table(
            {
                "c_custkey": pa.array([], pa.int64()),
                "c_name": pa.array([], pa.string()),
                "revenue_units": pa.array([], pa.int64()),
            }
        )
    cand = pa.concat_tables(parts)
    ck = cand["c_custkey"].to_numpy(zero_copy_only=False)
    rv = cand["revenue_units"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ck, -rv))[: k]
    win_keys = np.sort(ck[order])
    rev_by_key = {int(c): int(r) for c, r in zip(ck[order], rv[order])}

    def _name_pick(b: pa.Table) -> pa.Table:
        cc = pc.cast(b["c_custkey"], pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(win_keys, cc), max(len(win_keys) - 1, 0))
        keep = (win_keys[pos] == cc) if len(win_keys) else np.zeros(len(cc), bool)
        return b.filter(pa.array(keep)).select(["c_custkey", "c_name"])

    names = [
        t
        for t in customer.map_batches(
            _name_pick, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_size=None, batch_format="pyarrow")
        if len(t)
    ]
    nm = pa.concat_tables(names) if names else pa.table(
        {"c_custkey": pa.array([], pa.int64()), "c_name": pa.array([], pa.string())}
    )
    name_by_key = {
        int(c): n
        for c, n in zip(
            nm["c_custkey"].to_numpy(zero_copy_only=False), nm["c_name"].to_pylist()
        )
    }
    final_keys = ck[order]
    return pa.table(
        {
            "c_custkey": pa.array(final_keys.astype(np.int64)),
            "c_name": pa.array(
                [name_by_key.get(int(c), "") for c in final_keys], pa.string()
            ),
            "revenue_units": pa.array(
                np.array([rev_by_key[int(c)] for c in final_keys], np.int64)
            ),
        }
    )


def ref_integrity_audit(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    n_buckets: int = 64,
) -> pa.Table:
    """Cross-table referential-integrity audit — the FK data-quality
    gate a pipeline runs before joining fact tables: how many lineitem
    rows reference a missing order (orphans), and how many orders have
    no lineitem at all (childless) — both directions in ONE key-only
    co-partition.

    Both sides project to bare int64 keys (lineitem pre-counted per
    key per block, so the exchange is ≤ one row per (block, key));
    each hash bucket does two sorted-membership probes and emits a
    5-counter partial, and the driver folds ≤ ``n_buckets`` partial
    rows.  All counts → hash-exact.

    Reference parity: the reference's only integrity check is the
    per-row `ip_exists_in_yaml` probe (workbook_exporter-fe.py:
    1741-1754); this is its set-semantics generalization across
    tables.

    Output: one row (n_lineitem, n_matched_lineitem, n_orphan_lineitem,
    n_orders, n_childless_orders).
    """

    def _li_keys(b: pa.Table) -> pa.Table:
        t = pa.table({"k": pc.cast(b["l_orderkey"], pa.int64())})
        g = t.group_by("k").aggregate([([], "count_all")])
        g = g.rename_columns(["k", "n"])
        return pa.table(
            {
                "k": g["k"],
                "n": pc.cast(g["n"], pa.int64()),
                "kind": pa.array(np.ones(len(g), np.int8)),
            }
        )

    def _ord_keys(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "n": pa.array(np.ones(len(b), np.int64)),
                "kind": pa.array(np.zeros(len(b), np.int8)),
            }
        )

    def _bucket(b: pa.Table) -> pa.Table:
        k = pc.cast(b["k"], pa.int64())
        if (n_buckets & (n_buckets - 1)) == 0:
            bucket = pc.cast(pc.bit_wise_and(k, n_buckets - 1), pa.int32())
        else:
            bucket = pa.array(
                np.mod(k.to_numpy(zero_copy_only=False), n_buckets).astype(np.int32)
            )
        return b.append_column("__bucket", bucket)

    tagged = (
        lineitem.map_batches(_li_keys, batch_format="pyarrow", zero_copy_batch=True)
        .union(orders.map_batches(_ord_keys, batch_format="pyarrow"))
        .map_batches(_bucket, batch_format="pyarrow")
    )

    def _audit(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy(zero_copy_only=False)
        keys = g["k"].to_numpy(zero_copy_only=False)
        cnts = g["n"].to_numpy(zero_copy_only=False)
        is_l = kind == 1
        lk, ln = keys[is_l], cnts[is_l]
        ok = np.sort(keys[~is_l])
        n_li = int(ln.sum())
        if len(ok):
            pos = np.minimum(np.searchsorted(ok, lk), len(ok) - 1)
            matched = int(ln[ok[pos] == lk].sum())
        else:
            matched = 0
        lk_u = np.unique(lk)
        if len(lk_u):
            pos = np.minimum(np.searchsorted(lk_u, ok), len(lk_u) - 1)
            childless = int((lk_u[pos] != ok).sum()) if len(ok) else 0
        else:
            childless = len(ok)
        return pa.table(
            {
                "n_lineitem": pa.array([n_li], pa.int64()),
                "n_matched_lineitem": pa.array([matched], pa.int64()),
                "n_orphan_lineitem": pa.array([n_li - matched], pa.int64()),
                "n_orders": pa.array([len(ok)], pa.int64()),
                "n_childless_orders": pa.array([childless], pa.int64()),
            }
        )

    parts = [
        t
        for t in tagged.groupby("__bucket")
        .map_groups(_audit, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
        if len(t)
    ]
    if not parts:
        z = pa.array([0], pa.int64())
        return pa.table(
            {
                "n_lineitem": z,
                "n_matched_lineitem": z,
                "n_orphan_lineitem": z,
                "n_orders": z,
                "n_childless_orders": z,
            }
        )
    all_p = pa.concat_tables(parts)
    return pa.table(
        {
            c: pa.array([int(pc.sum(all_p[c]).as_py() or 0)], pa.int64())
            for c in all_p.column_names
        }
    )


def table_profile_events(
    events: ray.data.Dataset,
) -> ray.data.Dataset:
    """Column-profile (data-quality) audit over the events table — the
    Deequ-style ingest gate: null counts per column, NaN/Inf counts
    and exact cents min/max for the value column, total rows.

    Per-block partials carry (column_name, metric, s, mn, mx); the
    single domain-sized exchange folds them with Sum/Min/Max and the
    finisher picks the right fold per metric.  Null counts come from
    Arrow validity bitmaps (``null_count`` — zero-copy); NaN/Inf from
    one ``np.isnan`` / ``np.isinf`` kernel.  All int64 → hash-exact
    vs the UNION-ALL scalar-aggregate SQL.

    Output: (column_name, metric, val) — metrics n_rows, n_null per
    column, n_nan / n_inf / min_cents / max_cents for value.
    """
    from ray.data.aggregate import Max, Min, Sum

    I64MAX = np.int64(np.iinfo(np.int64).max)
    I64MIN = np.int64(np.iinfo(np.int64).min)
    COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")

    def _partial(b: pa.Table) -> pa.Table:
        names: list[str] = ["*"]
        metrics: list[str] = ["n_rows"]
        s: list[int] = [len(b)]
        mn: list[int] = [int(I64MAX)]
        mx: list[int] = [int(I64MIN)]
        for c in COLS:
            names.append(c)
            metrics.append("n_null")
            s.append(b[c].null_count)
            mn.append(int(I64MAX))
            mx.append(int(I64MIN))
        v = b["value"].to_numpy(zero_copy_only=False)
        finite = np.isfinite(v)
        for m, val in (
            ("n_nan", int(np.isnan(v).sum())),
            ("n_inf", int(np.isinf(v).sum())),
        ):
            names.append("value")
            metrics.append(m)
            s.append(val)
            mn.append(int(I64MAX))
            mx.append(int(I64MIN))
        if finite.any():
            c_f = np.round(v[finite] * 100.0).astype(np.int64)
            lo, hi = int(c_f.min()), int(c_f.max())
        else:
            lo, hi = int(I64MAX), int(I64MIN)
        names += ["value", "value"]
        metrics += ["min_cents", "max_cents"]
        s += [0, 0]
        mn += [lo, int(I64MAX)]
        mx += [int(I64MIN), hi]
        return pa.table(
            {
                "column_name": pa.array(names, pa.string()),
                "metric": pa.array(metrics, pa.string()),
                "s": pa.array(np.array(s, np.int64)),
                "mn": pa.array(np.array(mn, np.int64)),
                "mx": pa.array(np.array(mx, np.int64)),
            }
        )

    agg = (
        events.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["column_name", "metric"])
        .aggregate(Sum("s"), Min("mn"), Max("mx"))
    )

    def _finish(b: pa.Table) -> pa.Table:
        met = b["metric"].to_pylist()
        sv = pc.cast(b["sum(s)"], pa.int64()).to_numpy(zero_copy_only=False)
        mnv = pc.cast(b["min(mn)"], pa.int64()).to_numpy(zero_copy_only=False)
        mxv = pc.cast(b["max(mx)"], pa.int64()).to_numpy(zero_copy_only=False)
        val = np.where(
            np.array([m == "min_cents" for m in met]),
            mnv,
            np.where(np.array([m == "max_cents" for m in met]), mxv, sv),
        )
        return pa.table(
            {
                "column_name": b["column_name"],
                "metric": b["metric"],
                "val": pa.array(val.astype(np.int64)),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def large_volume_orders(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    min_qty: int = 280,
    n_buckets: int = 64,
) -> pa.Table:
    """TPC-H Q18-shaped HAVING filter: orders whose TOTAL line-item
    quantity reaches ``min_qty``, enriched with customer name — the
    "find the whales" audit.  The shape Q10/top-k can't cover: the
    predicate is on a POST-aggregation value, so no per-block filter
    can prune it; what keeps it scale-safe is that the aggregate input
    shrinks to slim (orderkey, qty) partials per block before the ONE
    keyed exchange, and everything after the HAVING is
    qualifying-set-sized.

    1. lineitem streams → per-block (l_orderkey, qty) int64 partials;
    2. ONE groupby-sum over the orderkey domain → HAVING filter inside
       the finishing map (still distributed);
    3. qualifying orders (few — ``min_qty`` governs; Q18's is chosen
       so the result is human-review-sized) join orders via
       :func:`hash_bucket_join` (fact-fact safe), then the qualifying
       custkeys are collected (bounded by the qualifying set) and
       broadcast to filter the streaming customer table for names —
       never a customer-table collect.

    Quantities are integral-valued doubles → exact int64.  Output:
    pa.Table (c_custkey, c_name, o_orderkey, o_orderdate, total_cents,
    sum_qty) sorted by sum_qty desc, o_orderkey asc.
    """
    from ray.data.aggregate import Sum

    def _li_partial(b: pa.Table) -> pa.Table:
        qty = pc.cast(pc.round(b["l_quantity"]), pa.int64())
        t = pa.table(
            {"l_orderkey": pc.cast(b["l_orderkey"], pa.int64()), "q": qty}
        )
        g = t.group_by("l_orderkey").aggregate([("q", "sum")])
        return g.rename_columns(["l_orderkey", "q"])

    sums = (
        lineitem.map_batches(_li_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(Sum("q"))
    )

    TH = int(min_qty)

    def _having(b: pa.Table) -> pa.Table:
        q = pc.cast(b["sum(q)"], pa.int64())
        t = pa.table({"l_orderkey": b["l_orderkey"], "sum_qty": q})
        return t.filter(pc.greater_equal(t["sum_qty"], TH))

    qual = sums.map_batches(_having, batch_format="pyarrow")

    joined = hash_bucket_join(
        qual,
        orders.map_batches(
            lambda b: pa.table(
                {
                    "l_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                    "o_custkey": pc.cast(b["o_custkey"], pa.int64()),
                    "o_orderdate": b["o_orderdate"],
                    "total_cents": pc.cast(
                        pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        "l_orderkey",
        ("sum_qty",),
        ("o_custkey", "o_orderdate", "total_cents"),
        n_buckets=n_buckets,
    )

    q_tbl = pa.concat_tables(
        ray.get([ref for ref in joined.to_arrow_refs()])
    ).combine_chunks()
    if len(q_tbl) == 0:
        return pa.table(
            {
                "c_custkey": pa.array([], pa.int64()),
                "c_name": pa.array([], pa.string()),
                "o_orderkey": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
                "total_cents": pa.array([], pa.int64()),
                "sum_qty": pa.array([], pa.int64()),
            }
        )
    want = np.unique(q_tbl["o_custkey"].to_numpy(zero_copy_only=False))
    want_ref = ray.put(want)

    class _NameFilter:
        def __init__(self, ref):
            self.want = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ck = pc.cast(b["c_custkey"], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            pos = np.searchsorted(self.want, ck)
            posc = np.minimum(pos, max(len(self.want) - 1, 0))
            hit = (
                (self.want[posc] == ck)
                if len(self.want)
                else np.zeros(len(ck), bool)
            )
            t = b.filter(pa.array(hit))
            return pa.table(
                {
                    "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
                    "c_name": t["c_name"],
                }
            )

    names = pa.concat_tables(
        ray.get(
            customer.map_batches(
                _NameFilter(want_ref),
                batch_format="pyarrow",
                concurrency=2,
            ).to_arrow_refs()
        )
    ).combine_chunks()

    nk = names["c_custkey"].to_numpy(zero_copy_only=False)
    order_n = np.argsort(nk, kind="stable")
    nk = nk[order_n]
    ck = q_tbl["o_custkey"].to_numpy(zero_copy_only=False)
    pos = np.searchsorted(nk, ck)
    name_col = names["c_name"].take(pa.array(order_n[pos]))

    out = pa.table(
        {
            "c_custkey": q_tbl["o_custkey"],
            "c_name": name_col,
            "o_orderkey": q_tbl["l_orderkey"],
            "o_orderdate": q_tbl["o_orderdate"],
            "total_cents": q_tbl["total_cents"],
            "sum_qty": q_tbl["sum_qty"],
        }
    )
    idx = pc.sort_indices(
        out,
        sort_keys=[("sum_qty", "descending"), ("o_orderkey", "ascending")],
    )
    return out.take(idx)


def promo_revenue_share(
    lineitem: ray.data.Dataset,
    part: pa.Table,
) -> pa.Table:
    """TPC-H Q14-shaped promotion-effect ratio: the share of total
    revenue earned by parts of type ``'PROMO'`` — one scalar audit row.

    part → (partkey, is_promo) broadcast (``ray.put`` once; 9 bytes a
    key — at a 100 TB part table switch to :func:`hash_bucket_join`,
    the ratio arithmetic is unchanged); lineitem streams through with
    per-block int64 partials (promo_units, total_units) in the exact
    cents × (100 − disc) units used by every revenue query here; ONE
    1-row exchange; the share is a SINGLE pinned int/int double
    division, bit-identical to the SQL's.

    Output: pa.Table (promo_units, total_units, promo_share) — 1 row.
    """
    from ray.data.aggregate import Sum

    li = broadcast_dim_join(
        lineitem, part, "l_partkey", "p_partkey", ("p_type",)
    )

    def _partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(b["l_extendedprice"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        disc = pc.cast(
            pc.round(pc.multiply(b["l_discount"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        units = cents * (np.int64(100) - disc)
        promo = pc.equal(b["p_type"], "PROMO").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "promo_units": pa.array(
                    [int(units[promo].sum())], pa.int64()
                ),
                "total_units": pa.array([int(units.sum())], pa.int64()),
            }
        )

    agg = li.map_batches(_partial, batch_format="pyarrow").sum(
        ["promo_units", "total_units"]
    )
    promo_u = int(agg["sum(promo_units)"])
    total_u = int(agg["sum(total_units)"])
    return pa.table(
        {
            "promo_units": pa.array([promo_u], pa.int64()),
            "total_units": pa.array([total_u], pa.int64()),
            "promo_share": pa.array(
                [promo_u / total_u if total_u else 0.0], pa.float64()
            ),
        }
    )


def late_order_priority(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    late_days: int = 30,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """TPC-H Q4-shaped EXISTS count: how many orders per priority
    class have at least one line item shipped more than ``late_days``
    after the order date — the fulfilment-SLA report.

    The EXISTS collapses to an aggregate: ``∃ line late ⟺
    max(l_shipdate) > o_orderdate + late_days``, so lineitem shrinks
    to per-block (orderkey, max_ship) partials → ONE groupby-max over
    the orderkey domain → :func:`hash_bucket_join` to orders (both
    sides fact-sized) → priority-domain count.  All timestamps compared
    as exact int64 µs.

    Output: (o_orderpriority, n_late_orders).
    """
    from ray.data.aggregate import Max, Sum

    def _li_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": pc.cast(b["l_orderkey"], pa.int64()),
                "ms": pc.cast(b["l_shipdate"], pa.int64()),
            }
        )
        g = t.group_by("l_orderkey").aggregate([("ms", "max")])
        return g.rename_columns(["l_orderkey", "ms"])

    mx = (
        lineitem.map_batches(_li_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(Max("ms"))
        .map_batches(
            lambda b: pa.table(
                {
                    "l_orderkey": b["l_orderkey"],
                    "ms": pc.cast(b["max(ms)"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    joined = hash_bucket_join(
        mx,
        orders.map_batches(
            lambda b: pa.table(
                {
                    "l_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                    "od": pc.cast(b["o_orderdate"], pa.int64()),
                    "o_orderpriority": b["o_orderpriority"],
                }
            ),
            batch_format="pyarrow",
        ),
        "l_orderkey",
        ("ms",),
        ("od", "o_orderpriority"),
        n_buckets=n_buckets,
    )

    LATE = np.int64(late_days) * np.int64(86_400 * 1_000_000)

    def _late_partial(b: pa.Table) -> pa.Table:
        ms = b["ms"].to_numpy(zero_copy_only=False)
        od = b["od"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {"o_orderpriority": b["o_orderpriority"]}
        ).filter(pa.array(ms > od + LATE))
        g = t.group_by("o_orderpriority").aggregate([([], "count_all")])
        return g.rename_columns(["o_orderpriority", "n"])

    agg = (
        joined.map_batches(_late_partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "n_late_orders": pc.cast(b["sum(n)"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def id_gap_audit(
    events: ray.data.Dataset,
    event_type: str = "click",
    bucket_shift: int = 14,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Sequence-integrity audit of an id feed: how much of the id range
    ``[min, max]`` observed for one event type is MISSING, in how many
    contiguous gap runs, and how long the worst run is — the "did the
    resumable ingest drop a shard?" check.  Gap detection needs every
    id's successor, which no per-block pass can see, so the shape is:

    1. ids bucket by ``id >> bucket_shift`` (RANGE partition — gaps are
       an order property, hash would scatter neighbors) and dedupe /
       sort / count internal gap runs per bucket in vectorized sweeps;
    2. per-BUCKET summaries (48 B each: min, max, n, runs, missing,
       max_gap) stitch in one final task — boundary gaps fall out of
       ``next bucket's min − this bucket's max − 1``, and entirely
       absent buckets are covered by the same subtraction.  A gap run
       never spans a summary boundary ambiguously because runs exist
       only BETWEEN present ids, so internal and boundary runs are
       disjoint by construction.

    At a 10¹² id domain raise ``bucket_shift`` so the summary stream
    stays one-task-sized (2²⁰ ids/bucket → ≤10⁶ summaries ≈ 50 MB).

    Output: 1 row (n_present, id_min, id_max, n_missing, n_gap_runs,
    max_gap) — all int64, hash-exact vs the lead() window SQL.
    """
    ET = event_type
    SHIFT = np.int64(bucket_shift)

    def _route(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["event_type"], ET))
        ids = np.unique(
            pc.cast(t["event_id"], pa.int64()).to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "id": pa.array(ids),
                "__part": pa.array(
                    np.mod(ids >> SHIFT, num_partitions).astype(np.int32)
                ),
                "bucket": pa.array(ids >> SHIFT),
            }
        )

    def _bucket_sweep(g: pa.Table) -> pa.Table:
        ids = np.unique(g["id"].to_numpy(zero_copy_only=False))
        bks = ids >> SHIFT
        starts = np.flatnonzero(np.r_[True, bks[1:] != bks[:-1]])
        bounds = np.r_[starts, len(ids)]
        out = {
            "bucket": [],
            "id_min": [],
            "id_max": [],
            "n_present": [],
            "n_runs": [],
            "n_missing": [],
            "max_gap": [],
        }
        d = np.diff(ids) - 1
        for k in range(len(starts)):
            lo, hi = bounds[k], bounds[k + 1]
            seg_d = d[lo : hi - 1]
            gaps = seg_d[seg_d > 0]
            out["bucket"].append(int(bks[lo]))
            out["id_min"].append(int(ids[lo]))
            out["id_max"].append(int(ids[hi - 1]))
            out["n_present"].append(int(hi - lo))
            out["n_runs"].append(int(len(gaps)))
            out["n_missing"].append(int(gaps.sum()))
            out["max_gap"].append(int(gaps.max()) if len(gaps) else 0)
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    def _stitch(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("bucket", "ascending")])
        g = g.take(idx)
        mn = g["id_min"].to_numpy(zero_copy_only=False)
        mx = g["id_max"].to_numpy(zero_copy_only=False)
        npres = g["n_present"].to_numpy(zero_copy_only=False)
        nruns = g["n_runs"].to_numpy(zero_copy_only=False)
        nmiss = g["n_missing"].to_numpy(zero_copy_only=False)
        mgap = g["max_gap"].to_numpy(zero_copy_only=False)
        bgap = mn[1:] - mx[:-1] - 1
        bgap = bgap[bgap > 0]
        return pa.table(
            {
                "n_present": pa.array([int(npres.sum())], pa.int64()),
                "id_min": pa.array([int(mn[0])], pa.int64()),
                "id_max": pa.array([int(mx[-1])], pa.int64()),
                "n_missing": pa.array(
                    [int(nmiss.sum() + bgap.sum())], pa.int64()
                ),
                "n_gap_runs": pa.array(
                    [int(nruns.sum() + len(bgap))], pa.int64()
                ),
                "max_gap": pa.array(
                    [
                        int(
                            max(
                                mgap.max(initial=0),
                                bgap.max(initial=0),
                            )
                        )
                    ],
                    pa.int64(),
                ),
            }
        )

    summaries = (
        events.map_batches(_route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(_bucket_sweep, batch_format="pyarrow")
        .map_batches(
            lambda b: b.append_column(
                "__one", pa.array(np.zeros(len(b), np.int32))
            ),
            batch_format="pyarrow",
        )
    )
    return summaries.groupby("__one").map_groups(
        lambda g: _stitch(g.drop_columns(["__one"])), batch_format="pyarrow"
    )


def top_revenue_suppliers(
    lineitem: ray.data.Dataset,
    supplier: pa.Table,
    ts_from_us: int,
    ts_to_us: int,
) -> pa.Table:
    """TPC-H Q15-shaped max-of-aggregate WITH TIES: the supplier(s)
    whose revenue over a shipping window equals the GLOBAL maximum —
    ``total = (SELECT max(total) FROM revenue_view)``.

    The distinctive shape is the second-phase scalar: revenue per
    supplier is a per-block int64 partial (cents × (100 − disc) exact
    units, window filter applied block-side so non-window rows never
    leave the scan) → ONE groupby-sum over the SUPPLIER domain — which
    is dimension-sized by definition (100 rows at sf0.01, ~1e6 at
    100 TB: still one heap), so taking that aggregate to the driver,
    computing the max and keeping ties is a bounded materialization,
    not a dataset one.  Names attach by sorted-lookup against the
    broadcast supplier dim.  Ties all survive, matching the SQL.

    Output: pa.Table (s_suppkey, s_name, total_units) sorted by key.
    """
    from ray.data.aggregate import Sum

    lo, hi = np.int64(ts_from_us), np.int64(ts_to_us)

    def _partial(b: pa.Table) -> pa.Table:
        ship = pc.cast(b["l_shipdate"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        m = (ship >= lo) & (ship < hi)
        if not m.any():
            return pa.table(
                {
                    "l_suppkey": pa.array([], pa.int64()),
                    "units": pa.array([], pa.int64()),
                }
            )
        sub = b.filter(pa.array(m))
        cents = pc.cast(
            pc.round(pc.multiply(sub["l_extendedprice"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        disc = pc.cast(
            pc.round(pc.multiply(sub["l_discount"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "l_suppkey": pc.cast(sub["l_suppkey"], pa.int64()),
                "units": pa.array(cents * (np.int64(100) - disc)),
            }
        )
        g = t.group_by("l_suppkey").aggregate([("units", "sum")])
        return g.rename_columns(["l_suppkey", "units"])

    rev = (
        lineitem.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("l_suppkey")
        .aggregate(Sum("units"))
        .to_arrow_refs()
    )
    tabs = [t for t in (ray.get(r) for r in rev) if len(t)]
    tbl = pa.concat_tables(tabs) if tabs else None  # supplier-domain
    if tbl is None:
        tbl = pa.table(
            {"l_suppkey": pa.array([], pa.int64()),
             "sum(units)": pa.array([], pa.int64())}
        )
    if len(tbl) == 0:
        return pa.table(
            {
                "s_suppkey": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string()),
                "total_units": pa.array([], pa.int64()),
            }
        )
    units = pc.cast(tbl["sum(units)"], pa.int64()).to_numpy(
        zero_copy_only=False
    )
    keys = pc.cast(tbl["l_suppkey"], pa.int64()).to_numpy(zero_copy_only=False)
    best = units.max()
    sel = units == best
    win_k, win_u = keys[sel], units[sel]
    order = np.argsort(win_k, kind="stable")
    win_k, win_u = win_k[order], win_u[order]
    from .sweep import sorted_probe

    sk = pc.cast(supplier["s_suppkey"], pa.int64()).to_numpy(
        zero_copy_only=False
    )
    s_order = np.argsort(sk, kind="stable")
    hit, posc = sorted_probe(sk[s_order], win_k)
    pos = s_order[posc[hit]]  # inner-join semantics: unknown keys drop
    return pa.table(
        {
            "s_suppkey": pa.array(win_k[hit]),
            "s_name": supplier["s_name"].take(pa.array(pos)),
            "total_units": pa.array(win_u[hit]),
        }
    )


def small_qty_brand_revenue(
    lineitem_scan,
    part: pa.Table,
    brand: str,
) -> pa.Table:
    """TPC-H Q17-shaped correlated-average threshold: revenue from
    line items of one brand whose quantity is below 20% of that PART's
    average quantity — ``l_quantity < 0.2 * (SELECT avg(l_quantity)
    … WHERE l_partkey = p_partkey)``.

    Two streaming passes (``lineitem_scan`` is a zero-arg Dataset
    factory so each pass is a fresh scan, never a cached
    materialization): pass 1 streams lineitem against the broadcast
    brand-filtered partkey set and reduces to per-part (cnt, sum_qty)
    — bounded by parts-per-brand (≤ part-dim / 25), so it broadcasts
    back; pass 2 re-streams and keeps rows with ``5·cnt·qty <
    sum_qty`` — the 0.2·avg predicate in EXACT integer arithmetic
    (l_quantity is integral; no float divide anywhere).  Output is a
    1-row audit: (n_small_lines, small_qty_units).
    """
    from ray.data.aggregate import Sum

    bsel = pc.equal(part["p_brand"], brand)
    bkeys = np.sort(
        pc.cast(part.filter(bsel)["p_partkey"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
    )
    bref = ray.put(bkeys)

    class _QtyPartial:
        def __init__(self, ref):
            self.keys = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            from .sweep import sorted_probe

            pk = pc.cast(b["l_partkey"], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            hit, _ = sorted_probe(self.keys, pk)
            if not hit.any():
                return pa.table(
                    {
                        "l_partkey": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                        "sq": pa.array([], pa.int64()),
                    }
                )
            sub = b.filter(pa.array(hit))
            t = pa.table(
                {
                    "l_partkey": pc.cast(sub["l_partkey"], pa.int64()),
                    "cnt": pa.array(np.ones(len(sub), np.int64)),
                    "sq": pc.cast(sub["l_quantity"], pa.int64()),
                }
            )
            g = t.group_by("l_partkey").aggregate(
                [("cnt", "sum"), ("sq", "sum")]
            )
            return g.rename_columns(["l_partkey", "cnt", "sq"])

    agg = (
        lineitem_scan()
        .map_batches(
            _QtyPartial,
            fn_constructor_args=(bref,),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        )
        .groupby("l_partkey")
        .aggregate(Sum("cnt"), Sum("sq"))
        .to_arrow_refs()
    )
    tabs = [t for t in (ray.get(r) for r in agg) if len(t)]
    th = (
        pa.concat_tables(tabs)
        if tabs
        else pa.table(
            {"l_partkey": pa.array([], pa.int64()),
             "sum(cnt)": pa.array([], pa.int64()),
             "sum(sq)": pa.array([], pa.int64())}
        )
    )  # ≤ parts-per-brand
    tk = pc.cast(th["l_partkey"], pa.int64()).to_numpy(zero_copy_only=False)
    tc = pc.cast(th["sum(cnt)"], pa.int64()).to_numpy(zero_copy_only=False)
    ts_ = pc.cast(th["sum(sq)"], pa.int64()).to_numpy(zero_copy_only=False)
    o = np.argsort(tk, kind="stable")
    thr_ref = ray.put((tk[o], tc[o], ts_[o]))

    class _SmallQty:
        def __init__(self, ref):
            self.keys, self.cnt, self.sq = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            from .sweep import sorted_probe

            pk = pc.cast(b["l_partkey"], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            hit, posc = sorted_probe(self.keys, pk)
            qty = pc.cast(b["l_quantity"], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            small = np.zeros(len(pk), bool)
            if hit.any():  # empty/missing brand → zero small lines
                small[hit] = (
                    5 * self.cnt[posc[hit]] * qty[hit] < self.sq[posc[hit]]
                )
            if not small.any():
                return pa.table(
                    {
                        "n_small_lines": pa.array([0], pa.int64()),
                        "small_qty_units": pa.array([0], pa.int64()),
                    }
                )
            sub = b.filter(pa.array(small))
            cents = pc.cast(
                pc.round(pc.multiply(sub["l_extendedprice"], 100.0)),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            disc = pc.cast(
                pc.round(pc.multiply(sub["l_discount"], 100.0)), pa.int64()
            ).to_numpy(zero_copy_only=False)
            units = cents * (np.int64(100) - disc)
            return pa.table(
                {
                    "n_small_lines": pa.array([len(sub)], pa.int64()),
                    "small_qty_units": pa.array([int(units.sum())], pa.int64()),
                }
            )

    out = (
        lineitem_scan()
        .map_batches(
            _SmallQty,
            fn_constructor_args=(thr_ref,),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        )
        .sum(["n_small_lines", "small_qty_units"])
    )
    return pa.table(
        {
            "n_small_lines": pa.array(
                [int(out["sum(n_small_lines)"])], pa.int64()
            ),
            "small_qty_units": pa.array(
                [int(out["sum(small_qty_units)"])], pa.int64()
            ),
        }
    )


def disjunctive_predicate_revenue(
    lineitem: ray.data.Dataset,
    part: pa.Table,
    clauses: tuple[tuple[str, int, int, int, int], ...],
) -> pa.Table:
    """TPC-H Q19-shaped disjunctive join predicate: revenue from line
    items matching ANY of several (brand, size-range, quantity-range)
    clause families — the OR-of-ANDs that defeats naive predicate
    pushdown.

    part → (partkey, brand-code, size) broadcast once (brands
    dictionary-encoded to int8 on the driver so the per-batch clause
    evaluation is pure integer compares); every lineitem batch resolves
    its partkeys with one searchsorted, then evaluates the whole
    disjunction as a vectorized bool reduction — K clauses × N rows of
    numpy compares, no row loop, no shuffle.  Output is a 1-row audit
    (n_lines, revenue_units) in exact int64 units.
    """
    brands = sorted({c[0] for c in clauses})
    bcode = {b: i for i, b in enumerate(brands)}
    pk = pc.cast(part["p_partkey"], pa.int64()).to_numpy(zero_copy_only=False)
    o = np.argsort(pk, kind="stable")
    pbr = part["p_brand"].to_numpy(zero_copy_only=False)[o]
    pcode = np.array([bcode.get(x, -1) for x in pbr], np.int8)
    psize = pc.cast(part["p_size"], pa.int64()).to_numpy(
        zero_copy_only=False
    )[o]
    dim_ref = ray.put((pk[o], pcode, psize))
    cl = tuple(
        (bcode[b], np.int64(slo), np.int64(shi), np.int64(qlo), np.int64(qhi))
        for b, slo, shi, qlo, qhi in clauses
    )

    class _Disj:
        def __init__(self, ref):
            self.keys, self.code, self.size = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            from .sweep import sorted_probe

            lpk = pc.cast(b["l_partkey"], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            hit, posc = sorted_probe(self.keys, lpk)
            qty = pc.cast(b["l_quantity"], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            keep = np.zeros(len(b), bool)
            if hit.any():
                code, size = self.code[posc], self.size[posc]
                for bc, slo, shi, qlo, qhi in cl:
                    keep |= (
                        (code == bc)
                        & (size >= slo)
                        & (size <= shi)
                        & (qty >= qlo)
                        & (qty <= qhi)
                    )
                keep &= hit
            if not keep.any():
                return pa.table(
                    {
                        "n_lines": pa.array([0], pa.int64()),
                        "revenue_units": pa.array([0], pa.int64()),
                    }
                )
            sub = b.filter(pa.array(keep))
            cents = pc.cast(
                pc.round(pc.multiply(sub["l_extendedprice"], 100.0)),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            disc = pc.cast(
                pc.round(pc.multiply(sub["l_discount"], 100.0)), pa.int64()
            ).to_numpy(zero_copy_only=False)
            units = cents * (np.int64(100) - disc)
            return pa.table(
                {
                    "n_lines": pa.array([len(sub)], pa.int64()),
                    "revenue_units": pa.array([int(units.sum())], pa.int64()),
                }
            )

    out = lineitem.map_batches(
        _Disj,
        fn_constructor_args=(dim_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    ).sum(["n_lines", "revenue_units"])
    return pa.table(
        {
            "n_lines": pa.array([int(out["sum(n_lines)"])], pa.int64()),
            "revenue_units": pa.array(
                [int(out["sum(revenue_units)"])], pa.int64()
            ),
        }
    )


def single_late_supplier_counts(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    supplier: pa.Table,
    late_days: int = 30,
    num_partitions: int = 64,
) -> pa.Table:
    """TPC-H Q21-shaped multi-EXISTS: per supplier, the number of
    multi-supplier orders on which that supplier was the ONLY one to
    ship late (> ``late_days`` after the order date) — the "suppliers
    who kept orders waiting" report, classically EXISTS(other supplier)
    AND NOT EXISTS(other late supplier).

    Both existentials collapse to one per-order aggregate: over
    distinct (orderkey, suppkey) pairs, ``n_supp > 1 AND n_late == 1``
    qualifies the single late suppkey.  Execution: fact-fact
    :func:`hash_bucket_join` lineitem↔orders on orderkey ships only
    (suppkey, shipdate)×(orderdate); per-block dedup shrinks to
    distinct (orderkey, suppkey, max-late) partials; ONE exchange on
    hash(orderkey) co-locates each order; the per-partition sweep is a
    sorted run-reduction (np.reduceat over run bounds — thousands of
    orders per task, zero per-order Python); qualifying late-suppkeys
    reduce to supplier-domain counts (bounded by the supplier dim, so
    the final attach of names is a driver-side sorted lookup).

    Output: pa.Table (s_suppkey, s_name, numwait) sorted by key,
    suppliers with zero qualifying orders omitted (inner semantics).
    """
    from .sweep import run_starts_table, with_part

    late_us = np.int64(late_days) * np.int64(86_400_000_000)

    joined = hash_bucket_join(
        lineitem.map_batches(
            lambda b: pa.table(
                {
                    "l_orderkey": pc.cast(b["l_orderkey"], pa.int64()),
                    "l_suppkey": pc.cast(b["l_suppkey"], pa.int64()),
                    "ship": pc.cast(b["l_shipdate"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        orders.map_batches(
            lambda b: pa.table(
                {
                    "l_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                    "odate": pc.cast(b["o_orderdate"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "l_orderkey",
        ("l_suppkey", "ship"),
        ("odate",),
        n_buckets=num_partitions,
    )

    def _pair_partial(b: pa.Table) -> pa.Table:
        late = pc.cast(
            pc.greater(
                pc.subtract(b["ship"], b["odate"]), pa.scalar(int(late_us))
            ),
            pa.int64(),
        )
        t = pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_suppkey": b["l_suppkey"],
                "late": late,
            }
        )
        g = t.group_by(["l_orderkey", "l_suppkey"]).aggregate(
            [("late", "max")]
        )
        g = g.rename_columns(["l_orderkey", "l_suppkey", "late"])
        return with_part(g, ["l_orderkey"], num_partitions)

    def _order_sweep(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    "s_suppkey": pa.array([], pa.int64()),
                    "numwait": pa.array([], pa.int64()),
                }
            )
        idx = pc.sort_indices(
            g,
            sort_keys=[
                ("l_orderkey", "ascending"),
                ("l_suppkey", "ascending"),
            ],
        )
        g = g.take(idx)
        ok = g["l_orderkey"].to_numpy(zero_copy_only=False)
        sk = g["l_suppkey"].to_numpy(zero_copy_only=False)
        lt = g["late"].to_numpy(zero_copy_only=False)
        # cross-block duplicates of the same (order, supp) pair: OR the
        # late flags, keep one row per pair
        pair_start = np.zeros(len(g), bool)
        pair_start[0] = True
        pair_start[1:] = (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])
        pb = np.flatnonzero(pair_start)
        lt = np.maximum.reduceat(lt, pb)
        ok, sk = ok[pb], sk[pb]
        runs = np.flatnonzero(
            np.r_[True, ok[1:] != ok[:-1]]
        )
        ends = np.r_[runs[1:], len(ok)]
        n_supp = ends - runs
        n_late = np.add.reduceat(lt, runs)
        # argmax-of-late within run: late is 0/1 and n_late==1 → the
        # single late pair's suppkey is reduceat-max of sk*late
        late_sk = np.maximum.reduceat(sk * lt, runs)
        qual = (n_supp > 1) & (n_late == 1)
        if not qual.any():
            return pa.table(
                {
                    "s_suppkey": pa.array([], pa.int64()),
                    "numwait": pa.array([], pa.int64()),
                }
            )
        t = pa.table(
            {
                "s_suppkey": pa.array(late_sk[qual]),
                "numwait": pa.array(np.ones(int(qual.sum()), np.int64)),
            }
        )
        g2 = t.group_by("s_suppkey").aggregate([("numwait", "sum")])
        return g2.rename_columns(["s_suppkey", "numwait"])

    from ray.data.aggregate import Sum

    per_supp = (
        joined.map_batches(
            _pair_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("__part")
        .map_groups(_order_sweep, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("numwait"))
        .to_arrow_refs()
    )
    tabs = [t for t in (ray.get(r) for r in per_supp) if len(t)]
    tbl = (
        pa.concat_tables(tabs)
        if tabs
        else pa.table(
            {"s_suppkey": pa.array([], pa.int64()),
             "sum(numwait)": pa.array([], pa.int64())}
        )
    )  # supplier-domain
    if len(tbl) == 0:
        return pa.table(
            {
                "s_suppkey": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string()),
                "numwait": pa.array([], pa.int64()),
            }
        )
    k = pc.cast(tbl["s_suppkey"], pa.int64()).to_numpy(zero_copy_only=False)
    v = pc.cast(tbl["sum(numwait)"], pa.int64()).to_numpy(
        zero_copy_only=False
    )
    from .sweep import sorted_probe

    o = np.argsort(k, kind="stable")
    k, v = k[o], v[o]
    sk = pc.cast(supplier["s_suppkey"], pa.int64()).to_numpy(
        zero_copy_only=False
    )
    so = np.argsort(sk, kind="stable")
    hit, posc = sorted_probe(sk[so], k)
    pos = so[posc[hit]]  # inner-join semantics: unknown keys drop
    return pa.table(
        {
            "s_suppkey": pa.array(k[hit]),
            "s_name": supplier["s_name"].take(pa.array(pos)),
            "numwait": pa.array(v[hit]),
        }
    )


def dormant_rich_customers(
    customer: ray.data.Dataset,
    orders: ray.data.Dataset,
    dormant_days: int = 365,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """TPC-H Q22-shaped global-scalar + dormancy anti-pattern: per
    nation, the customers whose balance beats the GLOBAL average of
    positive balances but whose LATEST order is older than
    ``dormant_days`` before the corpus' last order date — the
    "rich but drifting away" report (canonical Q22's never-ordered
    set is empty on this corpus, so the anti-join is generalized to
    an as-of dormancy cut; the two-scalar broadcast shape is intact).

    Three bounded scalars come first (sum/count of positive balances
    in exact cents, global max order date) — two 1-row streaming
    aggregates, no dataset materialization.  The above-average test is
    then EXACT integer cross-multiplication ``bal_cents · n_pos >
    sum_pos_cents`` (no float divide), the dormancy test exact int64
    µs.  orders reduce to per-customer max(o_orderdate) partials →
    fact-fact :func:`hash_bucket_join` to customer on custkey →
    nation-domain count/sum aggregate.

    Output: (c_nationkey, n_dormant_rich, sum_bal_cents) per nation.
    """
    from ray.data.aggregate import Max, Sum

    def _bal_partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(b["c_acctbal"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        pos = cents > 0
        return pa.table(
            {
                "s": pa.array([int(cents[pos].sum())], pa.int64()),
                "n": pa.array([int(pos.sum())], pa.int64()),
            }
        )

    sc = customer.map_batches(
        _bal_partial, batch_format="pyarrow", zero_copy_batch=True
    ).sum(["s", "n"])
    sum_pos, n_pos = int(sc["sum(s)"]), int(sc["sum(n)"])
    def _max_partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"m": pa.array([], pa.int64())})
        return pa.table(
            {
                "m": pa.array(
                    [int(pc.max(pc.cast(b["o_orderdate"], pa.int64())).as_py())],
                    pa.int64(),
                )
            }
        )

    mx = orders.map_batches(
        _max_partial, batch_format="pyarrow", zero_copy_batch=True
    ).max("m")
    cutoff = int(mx) - dormant_days * 86_400_000_000

    def _last_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_custkey": pc.cast(b["o_custkey"], pa.int64()),
                "lo": pc.cast(b["o_orderdate"], pa.int64()),
            }
        )
        g = t.group_by("c_custkey").aggregate([("lo", "max")])
        return g.rename_columns(["c_custkey", "lo"])

    last = (
        orders.map_batches(
            _last_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("c_custkey")
        .aggregate(Max("lo"))
        .map_batches(
            lambda b: pa.table(
                {
                    "c_custkey": b["c_custkey"],
                    "lo": pc.cast(b["max(lo)"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    cust = customer.map_batches(
        lambda b: pa.table(
            {
                "c_custkey": pc.cast(b["c_custkey"], pa.int64()),
                "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
                "bal": pc.cast(
                    pc.round(pc.multiply(b["c_acctbal"], 100.0)), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = hash_bucket_join(
        cust,
        last,
        "c_custkey",
        ("c_nationkey", "bal"),
        ("lo",),
        n_buckets=num_partitions,
    )

    def _qualify(b: pa.Table) -> pa.Table:
        bal = b["bal"].to_numpy(zero_copy_only=False)
        lo = b["lo"].to_numpy(zero_copy_only=False)
        keep = (bal * np.int64(n_pos) > np.int64(sum_pos)) & (
            lo < np.int64(cutoff)
        )
        sub = b.filter(pa.array(keep))
        t = pa.table(
            {
                "c_nationkey": sub["c_nationkey"],
                "n": pa.array(np.ones(len(sub), np.int64)),
                "sb": sub["bal"],
            }
        )
        g = t.group_by("c_nationkey").aggregate([("n", "sum"), ("sb", "sum")])
        return g.rename_columns(["c_nationkey", "n", "sb"])

    agg = (
        joined.map_batches(
            _qualify, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("c_nationkey")
        .aggregate(Sum("n"), Sum("sb"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
                "n_dormant_rich": pc.cast(b["sum(n)"], pa.int64()),
                "sum_bal_cents": pc.cast(b["sum(sb)"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def revenue_band_forecast(
    lineitem: ray.data.Dataset,
    ts_from_us: int,
    ts_to_us: int,
    disc_lo_pct: int = 5,
    disc_hi_pct: int = 7,
    max_qty: int = 24,
) -> pa.Table:
    """TPC-H Q6-shaped what-if band scan: the revenue that would be
    forfeited by dropping discounts in a band — one tight
    filter-aggregate over (date, discount, quantity) predicates, the
    query class that lives or dies on read pruning.

    Everything happens block-side: three vectorized int compares
    (discount matched in exact integer PERCENT — never float
    equality), forfeit units = cents × disc_pct summed per block, ONE
    1-row exchange.  The scan projection is four columns; at 100 TB
    the date predicate additionally prunes row groups via parquet
    min/max (the reader consults exactly the footer statistics the
    ``parquet_rowgroup_audit`` query surfaces).

    Output: (n_lines, forfeited_units) — 1 row, exact int64.
    """
    lo, hi = np.int64(ts_from_us), np.int64(ts_to_us)
    dl, dh = np.int64(disc_lo_pct), np.int64(disc_hi_pct)
    mq = np.int64(max_qty)

    def _partial(b: pa.Table) -> pa.Table:
        ship = pc.cast(b["l_shipdate"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        disc = pc.cast(
            pc.round(pc.multiply(b["l_discount"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        qty = pc.cast(b["l_quantity"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        m = (
            (ship >= lo) & (ship < hi)
            & (disc >= dl) & (disc <= dh)
            & (qty < mq)
        )
        if not m.any():
            return pa.table(
                {
                    "n_lines": pa.array([0], pa.int64()),
                    "forfeited_units": pa.array([0], pa.int64()),
                }
            )
        cents = pc.cast(
            pc.round(pc.multiply(b["l_extendedprice"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)[m]
        return pa.table(
            {
                "n_lines": pa.array([int(m.sum())], pa.int64()),
                "forfeited_units": pa.array(
                    [int((cents * disc[m]).sum())], pa.int64()
                ),
            }
        )

    out = lineitem.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).sum(["n_lines", "forfeited_units"])
    return pa.table(
        {
            "n_lines": pa.array([int(out["sum(n_lines)"])], pa.int64()),
            "forfeited_units": pa.array(
                [int(out["sum(forfeited_units)"])], pa.int64()
            ),
        }
    )


def nation_trade_flow(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    supplier: pa.Table,
    nation: pa.Table,
    nation_a: str,
    nation_b: str,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """TPC-H Q7-shaped two-nation trade flow: shipping revenue between
    a pair of nations, in BOTH directions, per shipping year — the
    multi-hop star join (lineitem→supplier→nation on one arm,
    lineitem→orders→customer→nation on the other) that forces one
    fact-fact exchange no matter how the dims are arranged.

    Join order minimizes what moves: supplier and nation are broadcast
    dims (supp-nation resolves block-side on lineitem, killing every
    row whose supplier is in neither nation BEFORE the exchange);
    customer-nation resolves block-side on orders the same way; the
    single fact-fact :func:`hash_bucket_join` on orderkey then carries
    only the surviving rows' (supp_nation_code, units, year) — at two
    nations out of 25 that is ~2/25 of lineitem.  Year derives from
    the int64 µs shipdate via numpy datetime64 (exact calendar, no
    float).  Final aggregate is over ≤ 2 × 2 × years rows.

    Output: (supp_nation, cust_nation, l_year, revenue_units), only
    the two cross pairs (A→B, B→A), matching canonical Q7.
    """
    from ray.data.aggregate import Sum

    nk = pc.cast(nation["n_nationkey"], pa.int64()).to_numpy(
        zero_copy_only=False
    )
    nn = nation["n_name"].to_pylist()
    name_of = dict(zip(nk.tolist(), nn))
    keys_ab = np.array(
        sorted(k for k, v in name_of.items() if v in (nation_a, nation_b)),
        np.int64,
    )
    if len(keys_ab) != 2:
        raise ValueError(
            f"nation_trade_flow: nations {nation_a!r}/{nation_b!r} not "
            "found exactly once each"
        )

    sk = pc.cast(supplier["s_suppkey"], pa.int64()).to_numpy(
        zero_copy_only=False
    )
    snk = pc.cast(supplier["s_nationkey"], pa.int64()).to_numpy(
        zero_copy_only=False
    )
    so = np.argsort(sk, kind="stable")
    supp_ref = ray.put((sk[so], snk[so], keys_ab))

    class _SuppArm:
        """lineitem → (orderkey, supp nation, units, year), rows whose
        supplier is outside the pair dropped block-side."""

        def __init__(self, ref):
            self.sk, self.snk, self.ab = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            from .sweep import sorted_probe

            lsk = pc.cast(b["l_suppkey"], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            hit, pos = sorted_probe(self.sk, lsk)
            snat = self.snk[pos] if len(self.snk) else np.zeros(len(lsk), np.int64)
            keep = hit & (
                (snat == self.ab[0]) | (snat == self.ab[1])
            )
            sub = b.filter(pa.array(keep))
            ship = pc.cast(sub["l_shipdate"], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            year = (
                ship.astype("datetime64[us]")
                .astype("datetime64[Y]")
                .astype(np.int64)
                + 1970
            )
            cents = pc.cast(
                pc.round(pc.multiply(sub["l_extendedprice"], 100.0)),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            disc = pc.cast(
                pc.round(pc.multiply(sub["l_discount"], 100.0)), pa.int64()
            ).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "l_orderkey": pc.cast(sub["l_orderkey"], pa.int64()),
                    "snat": pa.array(snat[keep]),
                    "l_year": pa.array(year),
                    "units": pa.array(cents * (np.int64(100) - disc)),
                }
            )

    li_arm = lineitem.map_batches(
        _SuppArm,
        fn_constructor_args=(supp_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )

    # customer nation is itself resolved through a fact-fact join
    # (customer is order-of-customers sized, not dimension-sized at
    # 100 TB), then orders carry cust-nation into the orderkey join
    cust = customer.map_batches(
        lambda b: pa.table(
            {
                "c_custkey": pc.cast(b["c_custkey"], pa.int64()),
                "cnat": pc.cast(b["c_nationkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ords = orders.map_batches(
        lambda b: pa.table(
            {
                "c_custkey": pc.cast(b["o_custkey"], pa.int64()),
                "l_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ord_nat = hash_bucket_join(
        ords, cust, "c_custkey", ("l_orderkey",), ("cnat",),
        n_buckets=num_partitions,
    ).map_batches(
        lambda b: b.filter(
            pa.array(
                np.isin(
                    b["cnat"].to_numpy(zero_copy_only=False), keys_ab
                )
            )
        ).select(["l_orderkey", "cnat"]),
        batch_format="pyarrow",
    )

    joined = hash_bucket_join(
        li_arm, ord_nat, "l_orderkey",
        ("snat", "l_year", "units"), ("cnat",),
        n_buckets=num_partitions,
    )

    def _flow_partial(b: pa.Table) -> pa.Table:
        snat = b["snat"].to_numpy(zero_copy_only=False)
        cnat = b["cnat"].to_numpy(zero_copy_only=False)
        keep = snat != cnat  # cross-pair flows only (A→B, B→A)
        sub = b.filter(pa.array(keep))
        t = pa.table(
            {
                "snat": sub["snat"],
                "cnat": sub["cnat"],
                "l_year": sub["l_year"],
                "units": sub["units"],
            }
        )
        g = t.group_by(["snat", "cnat", "l_year"]).aggregate(
            [("units", "sum")]
        )
        return g.rename_columns(["snat", "cnat", "l_year", "units"])

    agg = (
        joined.map_batches(
            _flow_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["snat", "cnat", "l_year"])
        .aggregate(Sum("units"))
    )

    def _name(b: pa.Table) -> pa.Table:
        sn = [name_of[int(x)] for x in b["snat"].to_pylist()]
        cn = [name_of[int(x)] for x in b["cnat"].to_pylist()]
        return pa.table(
            {
                "supp_nation": pa.array(sn, pa.string()),
                "cust_nation": pa.array(cn, pa.string()),
                "l_year": pc.cast(b["l_year"], pa.int64()),
                "revenue_units": pc.cast(b["sum(units)"], pa.int64()),
            }
        )

    return agg.map_batches(_name, batch_format="pyarrow")


def nation_market_share(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    supplier: pa.Table,
    nation: pa.Table,
    region: pa.Table,
    part: pa.Table,
    target_nation: str,
    region_name: str,
    part_type: str,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """TPC-H Q8-shaped market share: within one REGION's market for one
    part TYPE, the share of revenue supplied by one NATION, per order
    year — the deepest star join in the classic suite (part, supplier,
    nation×2, region, orders, customer around lineitem) reduced to a
    single fact-fact exchange.

    Dim algebra happens on the driver (all dimension-sized): region →
    member-nation keys → region-customer test; supplier → is-target
    flag.  lineitem resolves BOTH part-type membership and the
    supplier flag block-side from one broadcast (rows outside the part
    type never leave the scan); orders resolve customer-region through
    one custkey bucket join and carry the order YEAR; the single
    orderkey bucket join then meets ~1/6 of lineitem with ~1/5 of
    orders.  Exact cents×(100−disc) units; share per year is ONE
    pinned int/int double division.

    Output: (o_year, target_units, total_units, mkt_share).
    """
    from ray.data.aggregate import Sum

    nk = pc.cast(nation["n_nationkey"], pa.int64()).to_numpy(
        zero_copy_only=False
    )
    nreg = pc.cast(nation["n_regionkey"], pa.int64()).to_numpy(
        zero_copy_only=False
    )
    nname = nation["n_name"].to_pylist()
    rk = pc.cast(region["r_regionkey"], pa.int64()).to_numpy(
        zero_copy_only=False
    )
    rname = region["r_name"].to_pylist()
    region_key = {v: k for k, v in zip(rk.tolist(), rname)}[region_name]
    region_nations = np.sort(nk[nreg == region_key])
    target_key = {v: k for k, v in zip(nk.tolist(), nname)}[target_nation]

    pk = pc.cast(part["p_partkey"], pa.int64()).to_numpy(zero_copy_only=False)
    tsel = pc.equal(part["p_type"], part_type).to_numpy(zero_copy_only=False)
    type_keys = np.sort(pk[tsel])
    sk = pc.cast(supplier["s_suppkey"], pa.int64()).to_numpy(
        zero_copy_only=False
    )
    snk = pc.cast(supplier["s_nationkey"], pa.int64()).to_numpy(
        zero_copy_only=False
    )
    so = np.argsort(sk, kind="stable")
    dims_ref = ray.put(
        (type_keys, sk[so], (snk[so] == target_key).astype(np.int64))
    )

    class _LiArm:
        def __init__(self, ref):
            self.pkeys, self.sk, self.is_t = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            from .sweep import sorted_probe

            lpk = pc.cast(b["l_partkey"], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            keep, _ = sorted_probe(self.pkeys, lpk)
            sub = b.filter(pa.array(keep))
            lsk = pc.cast(sub["l_suppkey"], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            shit, spos = sorted_probe(self.sk, lsk)
            is_t = np.where(
                shit,
                self.is_t[spos] if len(self.is_t) else 0,
                0,
            )
            cents = pc.cast(
                pc.round(pc.multiply(sub["l_extendedprice"], 100.0)),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            disc = pc.cast(
                pc.round(pc.multiply(sub["l_discount"], 100.0)), pa.int64()
            ).to_numpy(zero_copy_only=False)
            units = cents * (np.int64(100) - disc)
            return pa.table(
                {
                    "l_orderkey": pc.cast(sub["l_orderkey"], pa.int64()),
                    "units": pa.array(units),
                    "t_units": pa.array(units * is_t),
                }
            )

    li_arm = lineitem.map_batches(
        _LiArm,
        fn_constructor_args=(dims_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )

    cust = customer.map_batches(
        lambda b: pa.table(
            {
                "c_custkey": pc.cast(b["c_custkey"], pa.int64()),
                "cnat": pc.cast(b["c_nationkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ords = orders.map_batches(
        lambda b: pa.table(
            {
                "c_custkey": pc.cast(b["o_custkey"], pa.int64()),
                "l_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "o_year": pa.array(
                    pc.cast(b["o_orderdate"], pa.int64())
                    .to_numpy(zero_copy_only=False)
                    .astype("datetime64[us]")
                    .astype("datetime64[Y]")
                    .astype(np.int64)
                    + 1970
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ord_region = hash_bucket_join(
        ords, cust, "c_custkey", ("l_orderkey", "o_year"), ("cnat",),
        n_buckets=num_partitions,
    ).map_batches(
        lambda b: b.filter(
            pa.array(
                np.isin(
                    b["cnat"].to_numpy(zero_copy_only=False),
                    region_nations,
                )
            )
        ).select(["l_orderkey", "o_year"]),
        batch_format="pyarrow",
    )

    joined = hash_bucket_join(
        li_arm, ord_region, "l_orderkey",
        ("units", "t_units"), ("o_year",),
        n_buckets=num_partitions,
    )

    def _year_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_year": b["o_year"],
                "units": b["units"],
                "t_units": b["t_units"],
            }
        )
        g = t.group_by("o_year").aggregate(
            [("units", "sum"), ("t_units", "sum")]
        )
        return g.rename_columns(["o_year", "units", "t_units"])

    agg = (
        joined.map_batches(
            _year_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("o_year")
        .aggregate(Sum("units"), Sum("t_units"))
    )

    def _share(b: pa.Table) -> pa.Table:
        tot = pc.cast(b["sum(units)"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        tgt = pc.cast(b["sum(t_units)"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        share = np.where(
            tot > 0,
            tgt.astype(np.float64) / np.maximum(tot, 1).astype(np.float64),
            0.0,
        )
        return pa.table(
            {
                "o_year": pc.cast(b["o_year"], pa.int64()),
                "target_units": pa.array(tgt),
                "total_units": pa.array(tot),
                "mkt_share": pa.array(share),
            }
        )

    return agg.map_batches(_share, batch_format="pyarrow")


def fd_violation_audit(
    ds: ray.data.Dataset,
    lhs_col: str,
    rhs_col: str,
) -> pa.Table:
    """Functional-dependency audit: does ``lhs → rhs`` hold?  The
    data-quality rule behind every "is this column a key / a stable
    attribute of X" question — counts the LHS keys whose RHS takes
    more than one distinct value, and how bad the worst offender is.

    Rows collapse block-side to distinct (lhs, rhs) pairs (group_by
    per block), ONE exchange on lhs co-locates each key's surviving
    pairs, and the per-group reduce is a sorted run-length count —
    the exchange carries distinct pairs, not rows, so a 100 TB fact
    with a near-valid FD ships ~|lhs| rows.

    Output: 1 row (n_lhs_keys, n_violating_keys, max_rhs_distinct,
    n_distinct_pairs) — all exact int64.
    """
    from ray.data.aggregate import Count

    def _pairs(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "lhs": pc.cast(b[lhs_col], pa.int64()),
                "rhs": b[rhs_col],
            }
        )
        g = t.group_by(["lhs", "rhs"]).aggregate([])
        return g

    pairs = (
        ds.map_batches(_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lhs", "rhs"])
        .aggregate(Count())
        .drop_columns(["count()"])
    )

    def _per_lhs(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"lhs": b["lhs"], "n_rhs": pa.array(np.ones(len(b), np.int64))}
        )
        g = t.group_by("lhs").aggregate([("n_rhs", "sum")])
        return g.rename_columns(["lhs", "n_rhs"])

    from ray.data.aggregate import Sum

    per_lhs = (
        pairs.map_batches(_per_lhs, batch_format="pyarrow")
        .groupby("lhs")
        .aggregate(Sum("n_rhs"))
    )

    def _summary(b: pa.Table) -> pa.Table:
        n = pc.cast(b["sum(n_rhs)"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "n_lhs_keys": pa.array([len(n)], pa.int64()),
                "n_violating_keys": pa.array([int((n > 1).sum())], pa.int64()),
                "max_rhs_distinct": pa.array(
                    [int(n.max()) if len(n) else 0], pa.int64()
                ),
                "n_distinct_pairs": pa.array([int(n.sum())], pa.int64()),
            }
        )

    parts = per_lhs.map_batches(_summary, batch_format="pyarrow")
    agg = parts.sum(["n_lhs_keys", "n_violating_keys", "n_distinct_pairs"])
    mx = parts.max("max_rhs_distinct")
    return pa.table(
        {
            "n_lhs_keys": pa.array([int(agg["sum(n_lhs_keys)"])], pa.int64()),
            "n_violating_keys": pa.array(
                [int(agg["sum(n_violating_keys)"])], pa.int64()
            ),
            "max_rhs_distinct": pa.array([int(mx)], pa.int64()),
            "n_distinct_pairs": pa.array(
                [int(agg["sum(n_distinct_pairs)"])], pa.int64()
            ),
        }
    )


def all_orders_above_nation_avg(
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Universal-quantifier report (the ∀ dual of Q21's ∃): per
    nation, how many multi-order customers placed EVERY order above
    their nation's average order value — ``ALL`` collapses to
    ``min(order_total) > nation_avg``, and the average test is exact
    integer cross-multiplication ``min_cents · nation_n >
    nation_sum_cents`` (no float divide anywhere).

    Plan: orders shrink block-side to per-customer (min_cents, n)
    partials → ONE custkey exchange; customer attaches nationkey via
    the custkey bucket join; nation totals are a second, nation-domain
    exchange over the SAME partials (pre-aggregated block-side, so the
    fact streams once); the driver broadcast is nation-domain-sized.

    Output: (c_nationkey, n_customers, n_all_above) per nation —
    multi-order customers only (a single order is trivially ALL).
    """
    from ray.data.aggregate import Min, Sum

    def _ord_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_custkey": pc.cast(b["o_custkey"], pa.int64()),
                "cents": pc.cast(
                    pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                    pa.int64(),
                ),
                "n": pa.array(np.ones(len(b), np.int64)),
            }
        )
        g = t.group_by("c_custkey").aggregate(
            [("cents", "min"), ("cents", "sum"), ("n", "sum")]
        )
        return g.rename_columns(["c_custkey", "min_c", "sum_c", "n"])

    per_cust = (
        orders.map_batches(
            _ord_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("c_custkey")
        .aggregate(Min("min_c"), Sum("sum_c"), Sum("n"))
        .map_batches(
            lambda b: pa.table(
                {
                    "c_custkey": b["c_custkey"],
                    "min_c": pc.cast(b["min(min_c)"], pa.int64()),
                    "sum_c": pc.cast(b["sum(sum_c)"], pa.int64()),
                    "n": pc.cast(b["sum(n)"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    cust = customer.map_batches(
        lambda b: pa.table(
            {
                "c_custkey": pc.cast(b["c_custkey"], pa.int64()),
                "cnat": pc.cast(b["c_nationkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = hash_bucket_join(
        per_cust, cust, "c_custkey", ("min_c", "sum_c", "n"), ("cnat",),
        n_buckets=num_partitions,
    ).materialize()  # consumed twice: nation totals + the ALL test

    def _nation_tot(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"cnat": b["cnat"], "sum_c": b["sum_c"], "n": b["n"]}
        )
        g = t.group_by("cnat").aggregate([("sum_c", "sum"), ("n", "sum")])
        return g.rename_columns(["cnat", "sum_c", "n"])

    from ray.data.aggregate import Sum as _Sum

    nat = (
        joined.map_batches(_nation_tot, batch_format="pyarrow")
        .groupby("cnat")
        .aggregate(_Sum("sum_c"), _Sum("n"))
        .to_arrow_refs()
    )
    tabs = [t for t in (ray.get(r) for r in nat) if len(t)]
    ntbl = pa.concat_tables(tabs)
    nk = pc.cast(ntbl["cnat"], pa.int64()).to_numpy(zero_copy_only=False)
    ns = pc.cast(ntbl["sum(sum_c)"], pa.int64()).to_numpy(
        zero_copy_only=False
    )
    nn = pc.cast(ntbl["sum(n)"], pa.int64()).to_numpy(zero_copy_only=False)
    o = np.argsort(nk, kind="stable")
    nat_ref = ray.put((nk[o], ns[o], nn[o]))

    class _AllAbove:
        def __init__(self, ref):
            self.nk, self.ns, self.nn = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            from .sweep import sorted_probe

            cnat = b["cnat"].to_numpy(zero_copy_only=False)
            _, pos = sorted_probe(self.nk, cnat)
            minc = b["min_c"].to_numpy(zero_copy_only=False)
            n = b["n"].to_numpy(zero_copy_only=False)
            multi = n > 1
            above = multi & (
                minc * self.nn[pos] > self.ns[pos]
            )
            t = pa.table(
                {
                    "c_nationkey": pa.array(cnat[multi]),
                    "n_customers": pa.array(
                        np.ones(int(multi.sum()), np.int64)
                    ),
                    "n_all_above": pa.array(
                        above[multi].astype(np.int64)
                    ),
                }
            )
            g = t.group_by("c_nationkey").aggregate(
                [("n_customers", "sum"), ("n_all_above", "sum")]
            )
            return g.rename_columns(
                ["c_nationkey", "n_customers", "n_all_above"]
            )

    from ray.data.aggregate import Sum as _Sum2

    agg = (
        joined.map_batches(
            _AllAbove,
            fn_constructor_args=(nat_ref,),
            batch_format="pyarrow",
            concurrency=(1, 8),
        )
        .groupby("c_nationkey")
        .aggregate(_Sum2("n_customers"), _Sum2("n_all_above"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
                "n_customers": pc.cast(b["sum(n_customers)"], pa.int64()),
                "n_all_above": pc.cast(b["sum(n_all_above)"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def revenue_share_hierarchy(
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    nation: pa.Table,
    num_partitions: int = 64,
) -> pa.Table:
    """Percent-of-parent HIERARCHICAL rollup: order revenue by nation,
    each nation's share of its REGION, each region's share of the
    GRAND total — the drill-down report shape (child/parent ratio at
    every level), all levels derived from ONE pass over the fact.

    orders reduce block-side to per-customer cents partials → custkey
    bucket join attaches nationkey → nation-domain aggregate.  The
    nation→region→total cascade then happens on the driver over the
    NATION-domain table (25 rows; dimension-sized by definition), with
    every share ONE pinned int/int double division.

    Output: (c_nationkey, n_regionkey, nation_cents,
    share_of_region, share_of_total) sorted by nation key.
    """
    from ray.data.aggregate import Sum

    def _ord_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_custkey": pc.cast(b["o_custkey"], pa.int64()),
                "cents": pc.cast(
                    pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                    pa.int64(),
                ),
            }
        )
        g = t.group_by("c_custkey").aggregate([("cents", "sum")])
        return g.rename_columns(["c_custkey", "cents"])

    per_cust = orders.map_batches(
        _ord_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cust = customer.map_batches(
        lambda b: pa.table(
            {
                "c_custkey": pc.cast(b["c_custkey"], pa.int64()),
                "cnat": pc.cast(b["c_nationkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = hash_bucket_join(
        per_cust, cust, "c_custkey", ("cents",), ("cnat",),
        n_buckets=num_partitions,
    )

    def _nat_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"cnat": b["cnat"], "cents": b["cents"]})
        g = t.group_by("cnat").aggregate([("cents", "sum")])
        return g.rename_columns(["cnat", "cents"])

    agg = (
        joined.map_batches(_nat_partial, batch_format="pyarrow")
        .groupby("cnat")
        .aggregate(Sum("cents"))
        .to_arrow_refs()
    )
    tabs = [t for t in (ray.get(r) for r in agg) if len(t)]
    ntbl = (
        pa.concat_tables(tabs)
        if tabs
        else pa.table(
            {"cnat": pa.array([], pa.int64()),
             "sum(cents)": pa.array([], pa.int64())}
        )
    )
    nk = pc.cast(ntbl["cnat"], pa.int64()).to_numpy(zero_copy_only=False)
    nc = pc.cast(ntbl["sum(cents)"], pa.int64()).to_numpy(
        zero_copy_only=False
    )
    o = np.argsort(nk, kind="stable")
    nk, nc = nk[o], nc[o]
    dk = pc.cast(nation["n_nationkey"], pa.int64()).to_numpy(
        zero_copy_only=False
    )
    dr = pc.cast(nation["n_regionkey"], pa.int64()).to_numpy(
        zero_copy_only=False
    )
    do = np.argsort(dk, kind="stable")
    # inner-join semantics vs the nation dim: a fact nationkey absent
    # from the dim is dropped (loudly counted), never mis-assigned —
    # raw searchsorted would index past the end or alias a neighbor
    # (the ee0b679 sweep.sorted_probe convention).
    from .sweep import sorted_probe

    hit, pos = sorted_probe(dk[do], nk)
    if not hit.all():
        import logging

        logging.getLogger(__name__).warning(
            "revenue_share_hierarchy: dropped %d fact nationkeys absent "
            "from the nation dim (inner-join semantics)",
            int((~hit).sum()),
        )
        nk, nc, pos = nk[hit], nc[hit], pos[hit]
    reg = dr[do][pos]
    total = int(nc.sum())
    reg_tot = {int(r): 0 for r in np.unique(reg)}
    for r, c in zip(reg, nc):
        reg_tot[int(r)] += int(c)
    share_reg = np.array(
        [c / reg_tot[int(r)] if reg_tot[int(r)] else 0.0
         for r, c in zip(reg, nc)],
        np.float64,
    )
    share_tot = np.array(
        [c / total if total else 0.0 for c in nc], np.float64
    )
    return pa.table(
        {
            "c_nationkey": pa.array(nk),
            "n_regionkey": pa.array(reg),
            "nation_cents": pa.array(nc),
            "share_of_region": pa.array(share_reg),
            "share_of_total": pa.array(share_tot),
        }
    )


def auto_equi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    left_carry: tuple[str, ...],
    right_carry: tuple[str, ...],
    broadcast_bytes: int = 64 << 20,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """ADAPTIVE equi-join: picks broadcast vs shuffle from the right
    side's MEASURED size — the plan decision an optimizer makes from
    statistics.  The right side materializes once to be measured;
    nothing is wasted either way, because BOTH downstream plans consume
    those exact blocks (the broadcast plan collects them, the shuffle
    plan feeds them to the bucket exchange) — the only cost of a huge
    right side is object-store residency, which Ray spills.  Callers
    that already know the side is fact-sized should call
    :func:`hash_bucket_join` directly and skip the measure.

    ≤ ``broadcast_bytes`` → the right side collects ONCE into the
    object store and every left batch resolves keys with a sorted
    lookup — zero shuffle, the map-side join.  Larger → the
    :func:`hash_bucket_join` co-partition exchange (nothing
    corpus-sized is ever broadcast).  The chosen plan is logged;
    outputs are identical by construction (same inner equi-join
    semantics, right side unique per key).
    """
    import logging

    right = right.materialize()
    size = right.size_bytes() or 0
    if size <= broadcast_bytes:
        logging.getLogger(__name__).info(
            "auto_equi_join: broadcast plan (%d B right side)", size
        )
        tabs = [t for t in ray.get(right.to_arrow_refs()) if len(t)]
        if not tabs:
            sch = right.schema().base_schema
            empty = pa.table(
                {f.name: pa.array([], f.type) for f in sch}
            )
            tabs = [empty]
        rtbl = pa.concat_tables(tabs).combine_chunks()
        cols = [key, *right_carry]
        rtbl = rtbl.select(cols)
        rtbl = rtbl.take(pc.sort_indices(pc.cast(rtbl[key], pa.int64())))
        return broadcast_dim_join(
            left.map_batches(
                lambda b: b.select([key, *left_carry]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            rtbl,
            key,
            key,
            tuple(right_carry),
        )
    logging.getLogger(__name__).info(
        "auto_equi_join: shuffle plan (%d B right side)", size
    )
    return hash_bucket_join(
        left, right, key, left_carry, right_carry, n_buckets=n_buckets
    )


# ---------------------------------------------------------------------------
# r5: the six remaining TPC-H shapes (Q2, Q9, Q11, Q12, Q16, Q20)
# ---------------------------------------------------------------------------
# This corpus has no partsupp table and no l_shipmode / l_commitdate /
# s_comment columns, so each query keeps its distinctive SHAPE over
# what exists (the Q22 adaptation precedent): the "supplies" relation
# is the DISTINCT (l_partkey, l_suppkey) pairs observed in lineitem,
# per-unit "cost" is exact MIN(extendedprice-cents), and the Q16
# complaint screen is the s_acctbal < 0 supplier set. Every aggregate
# is exact int64; every dimension attach routes through sweep.
# sorted_probe against a broadcast table.


def _cents(b: pa.Table, col: str) -> np.ndarray:
    return pc.cast(pc.round(pc.multiply(b[col], 100.0)), pa.int64()).to_numpy(
        zero_copy_only=False
    )


def min_cost_supplier(
    lineitem: ray.data.Dataset,
    part: pa.Table,
    supplier: pa.Table,
    nation: pa.Table,
    p_size: int,
    excl_type: str,
    region_nations: set[int],
    k: int = 100,
) -> pa.Table:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) in a
    region achieving the per-part MINIMUM cost — the correlated-min
    subquery (`ps_supplycost = (SELECT min ...)`) with multi-dim joins
    and the canonical (acctbal DESC, nation, supplier, part) order.

    Adaptation (no partsupp): cost(part, supp) := MIN extendedprice
    cents over the pair's lineitem rows — exact int64, no division.

    Scale: part filter (size AND type — ~1/300 of the part dim) and the
    region supplier mask resolve BLOCK-SIDE from broadcast dims, so the
    exchange aggregates only filtered slim (partkey, suppkey, cents)
    partials; the aggregated cost table is (filtered-parts × region-
    suppliers)-bounded, so the per-part min + tie resolution is a
    bounded driver combine (dimension-domain class)."""
    from .sweep import sorted_probe

    pk = pc.cast(part["p_partkey"], pa.int64()).to_numpy(zero_copy_only=False)
    pmask = (
        pc.cast(part["p_size"], pa.int64()).to_numpy(zero_copy_only=False) == p_size
    ) & (np.asarray(part["p_type"].to_pandas() != excl_type))
    good_parts = np.sort(pk[pmask])

    sk = pc.cast(supplier["s_suppkey"], pa.int64()).to_numpy(zero_copy_only=False)
    snat = pc.cast(supplier["s_nationkey"], pa.int64()).to_numpy(zero_copy_only=False)
    region_suppliers = np.sort(sk[np.isin(snat, sorted(region_nations))])

    def _partial(b: pa.Table) -> pa.Table:
        lp = pc.cast(b["l_partkey"], pa.int64()).to_numpy(zero_copy_only=False)
        ls = pc.cast(b["l_suppkey"], pa.int64()).to_numpy(zero_copy_only=False)
        hit_p, _ = sorted_probe(good_parts, lp)
        hit_s, _ = sorted_probe(region_suppliers, ls)
        m = hit_p & hit_s
        if not m.any():
            return pa.table(
                {
                    "partkey": pa.array([], pa.int64()),
                    "suppkey": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                }
            )
        cents = _cents(b, "l_extendedprice")[m]
        t = pa.table(
            {
                "partkey": pa.array(lp[m], pa.int64()),
                "suppkey": pa.array(ls[m], pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )
        g = t.group_by(["partkey", "suppkey"]).aggregate([("cents", "min")])
        return g.rename_columns(["partkey", "suppkey", "cents"])

    agg = (
        lineitem.map_batches(_partial, batch_format="pyarrow")
        .groupby(["partkey", "suppkey"])
        .min("cents")
        .to_pandas()  # bounded: filtered-part × region-supplier domain
    )
    if len(agg) == 0:
        return pa.table(
            {
                "s_acctbal_cents": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string()),
                "n_name": pa.array([], pa.string()),
                "p_partkey": pa.array([], pa.int64()),
            }
        )
    agg = agg.rename(columns={"min(cents)": "cents"})
    pmin = agg.groupby("partkey")["cents"].transform("min")
    win = agg[agg["cents"] == pmin]

    sb = pc.cast(supplier["s_acctbal"], pa.float64())
    sb_cents = pc.cast(pc.round(pc.multiply(sb, 100.0)), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    s_order = np.argsort(sk, kind="stable")
    _, pos = sorted_probe(sk[s_order], win["suppkey"].to_numpy())
    sidx = s_order[pos]
    nk = pc.cast(nation["n_nationkey"], pa.int64()).to_numpy(zero_copy_only=False)
    n_order = np.argsort(nk, kind="stable")
    _, npos = sorted_probe(nk[n_order], snat[sidx])
    import pandas as pd

    out = pd.DataFrame(
        {
            "s_acctbal_cents": sb_cents[sidx],
            "s_name": np.asarray(supplier["s_name"].to_pandas())[sidx],
            "n_name": np.asarray(nation["n_name"].to_pandas())[n_order][npos],
            "p_partkey": win["partkey"].to_numpy(),
        }
    ).sort_values(
        ["s_acctbal_cents", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True],
        kind="stable",
    ).head(k)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def product_type_profit(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    part: pa.Table,
    supplier: pa.Table,
    nation: pa.Table,
    p_type: str,
) -> ray.data.Dataset:
    """TPC-H Q9 shape: profit per (nation, order-year) for one product
    class — the deep star (part filter + supplier→nation on lineitem,
    order-year via the fact-fact join) ending in a tiny-domain group.

    Adaptation (no ps_supplycost): profit := Σ cents·(100−disc).

    Scale: part mask and supplier→nation resolve block-side (broadcast
    dims); the only exchange of fact rows is ONE orderkey hash-bucket
    co-partition carrying slim (nationkey, units); the final group is
    |nations|×|years|-domain."""
    from .sweep import sorted_probe

    pk = pc.cast(part["p_partkey"], pa.int64()).to_numpy(zero_copy_only=False)
    pmask = np.asarray(part["p_type"].to_pandas() == p_type)
    good_parts = np.sort(pk[pmask])
    sk = pc.cast(supplier["s_suppkey"], pa.int64()).to_numpy(zero_copy_only=False)
    snat = pc.cast(supplier["s_nationkey"], pa.int64()).to_numpy(zero_copy_only=False)
    s_order = np.argsort(sk, kind="stable")
    sk_sorted, snat_sorted = sk[s_order], snat[s_order]

    def _slim(b: pa.Table) -> pa.Table:
        lp = pc.cast(b["l_partkey"], pa.int64()).to_numpy(zero_copy_only=False)
        hit, _ = sorted_probe(good_parts, lp)
        if not hit.any():
            return pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "nationkey": pa.array([], pa.int64()),
                    "units": pa.array([], pa.int64()),
                }
            )
        ls = pc.cast(b["l_suppkey"], pa.int64()).to_numpy(zero_copy_only=False)[hit]
        shit, spos = sorted_probe(sk_sorted, ls)
        if not shit.all():
            raise ValueError("lineitem references unknown suppkey")
        cents = _cents(b, "l_extendedprice")[hit]
        disc = _cents(b, "l_discount")[hit]
        return pa.table(
            {
                "l_orderkey": pa.array(
                    pc.cast(b["l_orderkey"], pa.int64()).to_numpy(
                        zero_copy_only=False
                    )[hit],
                    pa.int64(),
                ),
                "nationkey": pa.array(snat_sorted[spos], pa.int64()),
                "units": pa.array(cents * (100 - disc), pa.int64()),
            }
        )

    def _oyear(b: pa.Table) -> pa.Table:
        # key must carry the join column's name on BOTH sides
        return pa.table(
            {
                "l_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "o_year": pc.cast(pc.year(b["o_orderdate"]), pa.int64()),
            }
        )

    slim = lineitem.map_batches(_slim, batch_format="pyarrow")
    oy = orders.map_batches(_oyear, batch_format="pyarrow")
    joined = hash_bucket_join(
        slim, oy, "l_orderkey", ("nationkey", "units"), ("o_year",)
    )
    agg = joined.groupby(["nationkey", "o_year"]).sum("units")

    nk = pc.cast(nation["n_nationkey"], pa.int64()).to_numpy(zero_copy_only=False)
    n_order = np.argsort(nk, kind="stable")
    n_names = np.asarray(nation["n_name"].to_pandas())[n_order]
    nk_sorted = nk[n_order]

    def _finish(b: pa.Table) -> pa.Table:
        keys = pc.cast(b["nationkey"], pa.int64()).to_numpy(zero_copy_only=False)
        hit, pos = sorted_probe(nk_sorted, keys)
        if not hit.all():
            raise ValueError("unknown nationkey in profit aggregate")
        return pa.table(
            {
                "n_name": pa.array(n_names[pos], pa.string()),
                "o_year": pc.cast(b["o_year"], pa.int64()),
                "profit_units": pc.cast(b["sum(units)"], pa.int64()),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def important_part_values(
    lineitem: ray.data.Dataset,
    supplier: pa.Table,
    nationkey: int,
    mult: int = 1000,
) -> ray.data.Dataset:
    """TPC-H Q11 shape: parts representing a significant share of one
    nation's supplied value — the group-then-global-threshold
    correlated scalar (`HAVING value > frac × (SELECT sum ...)`).

    Adaptation (no partsupp availqty·supplycost): value(part) :=
    Σ cents·(100−disc) over the nation's suppliers' lineitem rows.

    Scale + exactness: supplier mask resolves block-side; ONE
    part-domain exchange; the global total is a SCALAR driver
    aggregate over that same dataset, broadcast back into a
    distributed filter — the part table itself never collects. The
    threshold compare is the exact integer cross-multiplication
    ``value · mult > total`` (no division, no float)."""
    from .sweep import sorted_probe

    sk = pc.cast(supplier["s_suppkey"], pa.int64()).to_numpy(zero_copy_only=False)
    snat = pc.cast(supplier["s_nationkey"], pa.int64()).to_numpy(zero_copy_only=False)
    nation_suppliers = np.sort(sk[snat == nationkey])

    def _partial(b: pa.Table) -> pa.Table:
        ls = pc.cast(b["l_suppkey"], pa.int64()).to_numpy(zero_copy_only=False)
        hit, _ = sorted_probe(nation_suppliers, ls)
        if not hit.any():
            return pa.table(
                {
                    "p_partkey": pa.array([], pa.int64()),
                    "value_units": pa.array([], pa.int64()),
                }
            )
        cents = _cents(b, "l_extendedprice")[hit]
        disc = _cents(b, "l_discount")[hit]
        t = pa.table(
            {
                "p_partkey": pa.array(
                    pc.cast(b["l_partkey"], pa.int64()).to_numpy(
                        zero_copy_only=False
                    )[hit],
                    pa.int64(),
                ),
                "value_units": pa.array(cents * (100 - disc), pa.int64()),
            }
        )
        g = t.group_by("p_partkey").aggregate([("value_units", "sum")])
        return g.rename_columns(["p_partkey", "value_units"])

    agg = (
        lineitem.map_batches(_partial, batch_format="pyarrow")
        .groupby("p_partkey")
        .sum("value_units")
        .map_batches(
            lambda b: pa.table(
                {
                    "p_partkey": pc.cast(b["p_partkey"], pa.int64()),
                    "value_units": pc.cast(b["sum(value_units)"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()  # consumed twice: scalar total + threshold filter
    )
    total = int(agg.sum("value_units") or 0)

    def _thresh(b: pa.Table) -> pa.Table:
        v = b["value_units"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(v * mult > total))

    return agg.map_batches(_thresh, batch_format="pyarrow")


def priority_line_counts(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    ts_from_us: int,
    ts_to_us: int,
) -> ray.data.Dataset:
    """TPC-H Q12 shape: per line-class counts of high- vs low-priority
    orders — the fact-fact join feeding a CASE-bucketed aggregation.

    Adaptation (no l_shipmode / commitdate / receiptdate): the line
    class is ``l_returnflag`` and the window filter is on l_shipdate.

    Scale: slim (orderkey, returnflag) rows filtered block-side → ONE
    orderkey hash-bucket co-partition against slim orders → count
    partials per (returnflag, is_high) → flag-domain exchange."""
    lo, hi = np.int64(ts_from_us), np.int64(ts_to_us)

    def _slim(b: pa.Table) -> pa.Table:
        ship = pc.cast(b["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False)
        m = (ship >= lo) & (ship < hi)
        return pa.table(
            {
                "l_orderkey": pc.cast(b["l_orderkey"], pa.int64()).filter(
                    pa.array(m)
                ),
                "flag": b["l_returnflag"].filter(pa.array(m)),
            }
        )

    def _oslim(b: pa.Table) -> pa.Table:
        pri = b["o_orderpriority"].to_pandas()
        # key must carry the join column's name on BOTH sides
        return pa.table(
            {
                "l_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "is_high": pa.array(
                    pri.isin(["1-URGENT", "2-HIGH"]).to_numpy(), pa.bool_()
                ),
            }
        )

    joined = hash_bucket_join(
        lineitem.map_batches(_slim, batch_format="pyarrow"),
        orders.map_batches(_oslim, batch_format="pyarrow"),
        "l_orderkey",
        ("flag",),
        ("is_high",),
    )

    def _partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["flag", "is_high"]).aggregate([([], "count_all")])
        return g.rename_columns(["flag", "is_high", "n"])

    agg = (
        joined.map_batches(_partial, batch_format="pyarrow")
        .groupby(["flag", "is_high"])
        .sum("n")
    )

    def _pivot(b: pa.Table) -> pa.Table:
        hi_n = pc.cast(b["sum(n)"], pa.int64()).to_numpy(zero_copy_only=False)
        ish = b["is_high"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": b["flag"],
                "high_line_count": pa.array(np.where(ish, hi_n, 0), pa.int64()),
                "low_line_count": pa.array(np.where(ish, 0, hi_n), pa.int64()),
            }
        )

    return (
        agg.map_batches(_pivot, batch_format="pyarrow")
        .groupby("l_returnflag")
        .sum(["high_line_count", "low_line_count"])
        .map_batches(
            lambda b: pa.table(
                {
                    "l_returnflag": b["l_returnflag"],
                    "high_line_count": pc.cast(
                        b["sum(high_line_count)"], pa.int64()
                    ),
                    "low_line_count": pc.cast(
                        b["sum(low_line_count)"], pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )


def supplier_part_counts(
    lineitem: ray.data.Dataset,
    part: pa.Table,
    supplier: pa.Table,
    excl_brand: str,
    excl_type: str,
    sizes: tuple[int, ...],
) -> ray.data.Dataset:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type,
    size) over the supplies relation, minus a screened supplier set —
    COUNT(DISTINCT) + NOT-IN-subquery.

    Adaptation: supplies := DISTINCT (l_partkey, l_suppkey) observed in
    lineitem (no partsupp); the complaint screen is s_acctbal < 0 (no
    s_comment column).

    Scale: part-attr filter and the screened-supplier set resolve
    block-side from broadcast dims; the exchanges carry only the
    filtered distinct pair partials — groupby (brand, type, size,
    suppkey) distinct then (brand, type, size) count."""
    from .sweep import sorted_probe

    pk = pc.cast(part["p_partkey"], pa.int64()).to_numpy(zero_copy_only=False)
    brand = np.asarray(part["p_brand"].to_pandas())
    ptype = np.asarray(part["p_type"].to_pandas())
    size = pc.cast(part["p_size"], pa.int64()).to_numpy(zero_copy_only=False)
    pmask = (brand != excl_brand) & (ptype != excl_type) & np.isin(size, sizes)
    p_order = np.argsort(pk, kind="stable")
    pk_sorted = pk[p_order]
    keep_sorted = pmask[p_order]
    brand_s, type_s, size_s = brand[p_order], ptype[p_order], size[p_order]

    sk = pc.cast(supplier["s_suppkey"], pa.int64()).to_numpy(zero_copy_only=False)
    sbal = pc.cast(supplier["s_acctbal"], pa.float64()).to_numpy(
        zero_copy_only=False
    )
    screened = np.sort(sk[sbal < 0])

    def _pairs(b: pa.Table) -> pa.Table:
        lp = pc.cast(b["l_partkey"], pa.int64()).to_numpy(zero_copy_only=False)
        ls = pc.cast(b["l_suppkey"], pa.int64()).to_numpy(zero_copy_only=False)
        hit, pos = sorted_probe(pk_sorted, lp)
        if not hit.all():
            raise ValueError("lineitem references unknown partkey")
        m = keep_sorted[pos]
        bad, _ = sorted_probe(screened, ls)
        m &= ~bad
        if not m.any():
            return pa.table(
                {
                    "p_brand": pa.array([], pa.string()),
                    "p_type": pa.array([], pa.string()),
                    "p_size": pa.array([], pa.int64()),
                    "suppkey": pa.array([], pa.int64()),
                }
            )
        t = pa.table(
            {
                "p_brand": pa.array(brand_s[pos[m]], pa.string()),
                "p_type": pa.array(type_s[pos[m]], pa.string()),
                "p_size": pa.array(size_s[pos[m]], pa.int64()),
                "suppkey": pa.array(ls[m], pa.int64()),
            }
        )
        return (
            t.group_by(["p_brand", "p_type", "p_size", "suppkey"]).aggregate([])
        )  # block-side distinct

    distinct = (
        lineitem.map_batches(_pairs, batch_format="pyarrow")
        .groupby(["p_brand", "p_type", "p_size", "suppkey"])
        .count()
    )
    return (
        distinct.map_batches(
            lambda b: b.select(["p_brand", "p_type", "p_size"]),
            batch_format="pyarrow",
        )
        .groupby(["p_brand", "p_type", "p_size"])
        .count()
        .map_batches(
            lambda b: pa.table(
                {
                    "p_brand": b["p_brand"],
                    "p_type": b["p_type"],
                    "p_size": pc.cast(b["p_size"], pa.int64()),
                    "supplier_cnt": pc.cast(b["count()"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def excess_shippers(
    lineitem: ray.data.Dataset,
    part: pa.Table,
    supplier: pa.Table,
    name_prefix: str,
    nationkey: int,
    ts_from_us: int,
    ts_to_us: int,
    qty_threshold_hundredths: int,
) -> pa.Table:
    """TPC-H Q20 shape: suppliers in one nation having shipped MORE
    than a threshold of at least one part from a name class in a year
    — the nested agg-subquery → IN → semi-join chain.

    Adaptation (no partsupp availqty): the per-(part, supplier)
    comparison is against a fixed exact-int threshold (quantity in
    hundredths) instead of 0.5·availqty.

    Scale: part-prefix mask and window filter resolve block-side; ONE
    (partkey, suppkey)-domain exchange of qty partials; the qualifying
    supplier set is supplier-dimension-bounded → the semi-join is a
    bounded driver attach."""
    from .sweep import sorted_probe

    pk = pc.cast(part["p_partkey"], pa.int64()).to_numpy(zero_copy_only=False)
    pname = part["p_name"].to_pandas()
    good_parts = np.sort(pk[np.asarray(pname.str.startswith(name_prefix))])
    lo, hi = np.int64(ts_from_us), np.int64(ts_to_us)

    def _partial(b: pa.Table) -> pa.Table:
        lp = pc.cast(b["l_partkey"], pa.int64()).to_numpy(zero_copy_only=False)
        ship = pc.cast(b["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False)
        hit, _ = sorted_probe(good_parts, lp)
        m = hit & (ship >= lo) & (ship < hi)
        if not m.any():
            return pa.table(
                {
                    "partkey": pa.array([], pa.int64()),
                    "suppkey": pa.array([], pa.int64()),
                    "qty_h": pa.array([], pa.int64()),
                }
            )
        qty_h = _cents(b, "l_quantity")[m]  # quantity in exact hundredths
        t = pa.table(
            {
                "partkey": pa.array(lp[m], pa.int64()),
                "suppkey": pa.array(
                    pc.cast(b["l_suppkey"], pa.int64()).to_numpy(
                        zero_copy_only=False
                    )[m],
                    pa.int64(),
                ),
                "qty_h": pa.array(qty_h, pa.int64()),
            }
        )
        g = t.group_by(["partkey", "suppkey"]).aggregate([("qty_h", "sum")])
        return g.rename_columns(["partkey", "suppkey", "qty_h"])

    agg = (
        lineitem.map_batches(_partial, batch_format="pyarrow")
        .groupby(["partkey", "suppkey"])
        .sum("qty_h")
    )
    qual = agg.map_batches(
        lambda b: b.filter(
            pc.greater(b["sum(qty_h)"], qty_threshold_hundredths)
        ).select(["suppkey"]),
        batch_format="pyarrow",
    ).to_pandas()  # bounded: qualifying suppliers ≤ supplier dimension
    if "suppkey" not in qual.columns or len(qual) == 0:
        return pa.table(
            {"s_suppkey": pa.array([], pa.int64()), "s_name": pa.array([], pa.string())}
        )
    qual_set = np.unique(qual["suppkey"].to_numpy())

    sk = pc.cast(supplier["s_suppkey"], pa.int64()).to_numpy(zero_copy_only=False)
    snat = pc.cast(supplier["s_nationkey"], pa.int64()).to_numpy(zero_copy_only=False)
    hit, _ = sorted_probe(np.sort(qual_set), sk)
    m = hit & (snat == nationkey)
    import pandas as pd

    out = pd.DataFrame(
        {"s_suppkey": sk[m], "s_name": np.asarray(supplier["s_name"].to_pandas())[m]}
    ).sort_values("s_suppkey", kind="stable")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)

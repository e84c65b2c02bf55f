"""Extension-dispatched input source — reference `read_input_file`
parity (``/root/reference/workbook_exporter-fe.py:1703-1714`` dispatches
on ``os.path.splitext``: ``.csv`` → ``pd.read_csv``, ``.xlsx/.xls`` →
``pd.read_excel``; SURVEY §2.8 "ext dispatch" row).

The engine's scale format is Parquet (columnar, projection pushdown at
the row-group reader); CSV is supported for parity/ingest but reads
every column off storage by design — column selection happens after
parse, and the docstring-level guidance is "convert to Parquet once,
then pipeline". .xlsx is parsed with the stdlib zip+XML reader in
``sources/xlsx.py`` (no third-party codec); only legacy binary ``.xls``
remains gated (needs xlrd).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

from .parquet import good_num_blocks, read_table


def read_auto(
    path: str,
    columns: list[str] | None = None,
    skip_rows: int = 0,
    sheet_name: str | None = None,
) -> ray.data.Dataset:
    """Read one input file, format chosen by extension (the reference's
    upload surface accepts ``.csv/.xlsx/.xls``; we add ``.parquet`` as
    the scale path and ``.json`` lines for log-ish ingest).

    ``skip_rows``: banner rows to drop before the header — the
    reference reads its workbook exports with ``skiprows=6``
    (``/root/reference/workbook_exporter-fe.py:1708-1711``; visible in
    ``dummy_data/dummy_data.csv:1-7``). Applies to CSV and Excel."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".gz":
        # compressed text feeds (.csv.gz / .jsonl.gz — the shape crawl
        # drops arrive in): dispatch on the INNER extension and let
        # Arrow's native stream decompressor handle the codec — the
        # file is NOT inflated driver-side
        inner = os.path.splitext(os.path.splitext(path)[0])[1].lower()
        if inner == ".csv":
            ds = ray.data.read_csv(
                path, arrow_open_stream_args={"compression": "gzip"}
            )
            return ds.select_columns(columns) if columns else ds
        if inner in (".json", ".jsonl"):
            ds = ray.data.read_json(
                path, arrow_open_stream_args={"compression": "gzip"}
            )
            return ds.select_columns(columns) if columns else ds
        raise ValueError(f"unsupported compressed input {path!r}")
    if ext in (".parquet", ".pq"):
        return read_table(path, columns=columns)
    if ext == ".csv":
        import csv as _csv

        from pyarrow import csv as pacsv

        nb = good_num_blocks(path)
        kw: dict = {"override_num_blocks": nb} if nb else {}
        if skip_rows:
            # peek the header driver-side so duplicate column names can
            # be deduped pandas-style (Done, Done.1, ...) — workbook
            # exports repeat section labels, and Arrow refuses duplicate
            # fields where the reference's pandas path silently renames
            with open(path, newline="") as f:
                reader = _csv.reader(f)
                for _ in range(skip_rows):
                    next(reader)
                header = next(reader)
            seen: dict[str, int] = {}
            names = []
            for n in header:
                if n in seen:
                    seen[n] += 1
                    names.append(f"{n}.{seen[n]}")
                else:
                    seen[n] = 0
                    names.append(n)
            kw["read_options"] = pacsv.ReadOptions(
                skip_rows=skip_rows + 1, column_names=names
            )
        ds = ray.data.read_csv(path, **kw)
        return ds.select_columns(columns) if columns else ds
    if ext in (".json", ".jsonl"):
        ds = ray.data.read_json(path)
        return ds.select_columns(columns) if columns else ds
    if ext == ".xlsx":
        # stdlib zip+XML reader (sources/xlsx.py) — no third-party codec
        # needed; driver-side because workbook uploads are small (the
        # reference caps them at 16–100 MB). Sheet2+skiprows is the
        # reference's workbook layout (workbook_exporter-fe.py:1711).
        from .xlsx import read_xlsx_table

        tbl = read_xlsx_table(path, sheet_name=sheet_name, skip_rows=skip_rows)
        ds = ray.data.from_arrow(tbl)
        return ds.select_columns(columns) if columns else ds
    if ext == ".xls":
        # stdlib BIFF8/CFB reader (sources/xls.py) — same driver-side
        # contract as the .xlsx path
        from .xls import read_xls_table

        tbl = read_xls_table(path, sheet_name=sheet_name, skip_rows=skip_rows)
        ds = ray.data.from_arrow(tbl)
        return ds.select_columns(columns) if columns else ds
    if ext in (".arrow", ".feather", ".ipc"):
        # Arrow IPC / Feather-v2 file — the zero-parse interchange
        # format; each record batch becomes its own block (ray.put per
        # batch → from_arrow_refs), so a many-batch file parallelizes
        # without re-chunking. The batch loop is per-BATCH driver work
        # (metadata + one buffer hand-off each), not per-row.
        import ray as _ray
        from pyarrow import ipc as paipc

        with pa.memory_map(path) as mm:
            reader = paipc.open_file(mm)
            refs = [
                _ray.put(pa.Table.from_batches([reader.get_batch(i)]))
                for i in range(reader.num_record_batches)
            ]
        ds = ray.data.from_arrow_refs(refs)
        return ds.select_columns(columns) if columns else ds
    if ext == ".orc":
        # ORC — the columnar stripe format the Hadoop-side half of a
        # lake usually speaks; pyarrow's native reader. The driver
        # touches only METADATA (nstripes); each stripe's data is read
        # inside its own Ray task (ship path + stripe index, read in
        # the task), so the scan is stripe-parallel and never
        # driver-memory-bound — one task's return becomes one block
        # (r4 ADVICE: the old plan materialized every stripe on the
        # driver). Requires `path` on storage every worker sees, the
        # same contract every read in this repo carries.
        import ray as _ray
        from pyarrow import orc as paorc

        @_ray.remote
        def _read_stripe(p: str, i: int) -> pa.Table:
            from pyarrow import orc as _orc

            stripe = _orc.ORCFile(p).read_stripe(i)
            if isinstance(stripe, pa.RecordBatch):
                stripe = pa.Table.from_batches([stripe])
            return stripe

        nstripes = paorc.ORCFile(path).nstripes
        refs = [_read_stripe.remote(path, i) for i in range(nstripes)]
        ds = ray.data.from_arrow_refs(refs)
        return ds.select_columns(columns) if columns else ds
    if ext == ".docx":
        # the reference ALLOWS .docx uploads but never parses them
        # (workbook_exporter-fe.py:1928 ALLOWED_EXTENSIONS; no reader
        # branch) — the engine parses the WordprocessingML main part
        # (stdlib zip+XML, sources/docx.py) into one row per paragraph
        # so document uploads feed the text pipeline
        from .docx import read_docx_table

        ds = ray.data.from_arrow(read_docx_table(path))
        return ds.select_columns(columns) if columns else ds
    if ext in (".yaml", ".yml", ".eyaml"):
        # the second allowed-but-unparsed reference extension: a
        # previous export (the sink's own {section -> host -> field}
        # shape) reads back as flat rows, enabling diff/merge pipelines
        # over prior outputs
        from ..sinks.yaml_sink import load_yaml_ordered

        with open(path, encoding="utf-8") as f:
            doc = load_yaml_ordered(f.read())
        secs, hosts, fields, vals = [], [], [], []
        for sec, hostmap in doc.items():
            for host, fieldmap in (hostmap or {}).items():
                for field, val in (fieldmap or {}).items():
                    secs.append(str(sec))
                    hosts.append(str(host))
                    fields.append(str(field))
                    vals.append("" if val is None else str(val))
        tbl = pa.table(
            {
                "section": pa.array(secs, pa.string()),
                "host": pa.array(hosts, pa.string()),
                "field": pa.array(fields, pa.string()),
                "value": pa.array(vals, pa.string()),
            }
        )
        ds = ray.data.from_arrow(tbl)
        return ds.select_columns(columns) if columns else ds
    raise ValueError(f"unsupported input extension {ext!r} for {path!r}")


def synth_docs_jsonl(path: str, n: int = 2400, seed: int = 97) -> str:
    """Deterministic newline-delimited-JSON ingest fixture — the log-ish
    format the reference's upload surface never had but a crawl
    pipeline always does.  Pure-integer/string payload (no floats, so
    JSON round-tripping is exact on every parser); written atomically
    so concurrent ensure-calls can't observe a half file.

    Schema per line: doc_id (string), lang (string), source (string),
    n_chars (int), n_lines (int).
    """
    import json
    import os
    import tempfile

    import numpy as np

    if os.path.isfile(path):
        return path
    rng = np.random.default_rng(seed)
    langs = ["en", "de", "fr", "es", "pt"]
    sources = [f"crawl{i}" for i in range(6)]
    li = rng.integers(0, len(langs), n)
    si = rng.integers(0, len(sources), n)
    chars = rng.integers(40, 20_000, n)
    lines = rng.integers(1, 400, n)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".jsonl")
    with os.fdopen(fd, "w") as f:
        for i in range(n):
            f.write(
                json.dumps(
                    {
                        "doc_id": f"jd{i:06d}",
                        "lang": langs[int(li[i])],
                        "source": sources[int(si[i])],
                        "n_chars": int(chars[i]),
                        "n_lines": int(lines[i]),
                    },
                    separators=(",", ":"),
                )
                + "\n"
            )
    os.replace(tmp, path)
    return path


def synth_hive_events(root: str, n_sources: int = 8, seed: int = 139) -> str:
    """Deterministic hive-partitioned Parquet fixture
    (``root/source=<s>/part.parquet``) — the engine's own checkpoint
    layout (one directory per key range, `state/checkpoint.py`) read
    back with partition-column recovery.  Written atomically per
    partition dir so concurrent ensure-calls can't observe half a
    fixture; pure ints so every engine/oracle comparison is exact."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    done = os.path.join(root, "_DONE")
    if os.path.isfile(done):
        return root
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    for s in range(n_sources):
        d = os.path.join(root, f"source=src{s:02d}")
        # draw BEFORE the skip so a partially-generated fixture keeps
        # the rng stream aligned for the remaining partitions
        n = int(rng.integers(500, 3000))
        cents = rng.integers(-50_000, 50_000, n).astype(np.int64)
        if os.path.isdir(d):
            continue
        t = pa.table(
            {
                "event_id": pa.array(
                    np.arange(s * 100_000, s * 100_000 + n, dtype=np.int64)
                ),
                "cents": pa.array(cents),
            }
        )
        tmp = tempfile.mkdtemp(dir=root)
        pq.write_table(t, os.path.join(tmp, "part.parquet"))
        os.rename(tmp, d)
    with open(done, "w") as f:
        f.write("ok")
    return root


def synth_metrics_ipc(path: str, n: int = 5000, seed: int = 211) -> str:
    """Deterministic Arrow-IPC ingest fixture (multi-record-batch, so
    the reader's one-block-per-batch path is actually exercised) with a
    Parquet sibling holding IDENTICAL data for the DuckDB oracle —
    pure ints, exact on both readers.  Atomic like the other fixtures.

    Schema: metric_id (int64), shard (string), value_units (int64).
    """
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyarrow import ipc as paipc

    sibling = os.path.splitext(path)[0] + ".parquet"
    if os.path.isfile(path) and os.path.isfile(sibling):
        return path
    rng = np.random.default_rng(seed)
    tbl = pa.table(
        {
            "metric_id": pa.array(np.arange(n, dtype=np.int64)),
            "shard": pa.array(
                [f"shard{i:02d}" for i in rng.integers(0, 16, n)], pa.string()
            ),
            "value_units": pa.array(
                rng.integers(-(10**6), 10**6, n).astype(np.int64)
            ),
        }
    )
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".arrow")
    with os.fdopen(fd, "wb") as f:
        with paipc.new_file(f, tbl.schema) as w:
            for i in range(0, n, 1000):
                w.write_table(tbl.slice(i, 1000))
    fd2, tmp2 = tempfile.mkstemp(dir=d, suffix=".parquet")
    os.close(fd2)
    pq.write_table(tbl, tmp2)
    os.replace(tmp2, sibling)
    os.replace(tmp, path)
    return path


def synth_sensor_orc(path: str, n: int = 6000, seed: int = 401) -> str:
    """Deterministic ORC ingest fixture (multi-STRIPE, so the reader's
    one-block-per-stripe path is actually exercised) with a Parquet
    sibling holding IDENTICAL data for the DuckDB oracle — pure
    ints/strings, exact on both readers; atomic like the other
    fixtures.

    Schema: sensor_id (int64), zone (string), reading_units (int64).
    """
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyarrow import orc as paorc

    sibling = os.path.splitext(path)[0] + ".parquet"
    if os.path.isfile(path) and os.path.isfile(sibling):
        return path
    rng = np.random.default_rng(seed)
    tbl = pa.table(
        {
            "sensor_id": pa.array(np.arange(n, dtype=np.int64)),
            "zone": pa.array(
                [f"zone{i:02d}" for i in rng.integers(0, 12, n)], pa.string()
            ),
            "reading_units": pa.array(
                rng.integers(-(10**6), 10**6, n).astype(np.int64)
            ),
        }
    )
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".orc")
    os.close(fd)
    w = paorc.ORCWriter(tmp, stripe_size=16384)
    w.write(tbl)
    w.close()
    fd2, tmp2 = tempfile.mkstemp(dir=d, suffix=".parquet")
    os.close(fd2)
    pq.write_table(tbl, tmp2)
    os.replace(tmp2, sibling)
    os.replace(tmp, path)
    return path


def synth_logs_csv_gz(path: str, n: int = 4000, seed: int = 307) -> str:
    """Deterministic gzipped-CSV ingest fixture with a Parquet sibling
    holding IDENTICAL data for the DuckDB oracle — pure ints/strings,
    exact on both readers; atomic like the other fixtures.

    Schema: line_id (int64), level (string), n_bytes (int64).
    """
    import gzip
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    sibling = path[: -len(".csv.gz")] + ".parquet"
    if os.path.isfile(path) and os.path.isfile(sibling):
        return path
    rng = np.random.default_rng(seed)
    levels = np.array(["debug", "info", "warn", "error"])
    li = rng.integers(0, 4, n)
    nb = rng.integers(0, 65536, n).astype(np.int64)
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".csv.gz")
    with os.fdopen(fd, "wb") as raw, gzip.GzipFile(
        fileobj=raw, mode="wb", mtime=0
    ) as f:
        f.write(b"line_id,level,n_bytes\n")
        for i in range(n):
            f.write(f"{i},{levels[li[i]]},{nb[i]}\n".encode())
    tbl = pa.table(
        {
            "line_id": pa.array(np.arange(n, dtype=np.int64)),
            "level": pa.array(levels[li], pa.string()),
            "n_bytes": pa.array(nb),
        }
    )
    fd2, tmp2 = tempfile.mkstemp(dir=d, suffix=".parquet")
    os.close(fd2)
    pq.write_table(tbl, tmp2)
    os.replace(tmp2, sibling)
    os.replace(tmp, path)
    return path

"""Golden-corpus semantic test (SURVEY §5.1): ingest the reference's own
``dummy_data/dummy_data.csv`` through the engine's CSV source and check
the mapped semantics against facts from ``example_output.yaml`` — the
reference's de-facto spec pair.

Fidelity notes (verified against the pair, not assumed):

- The CSV export carries SEVEN pre-header rows (the reference's Excel
  path skips 6 and uses Sheet2; the CSV artifact has an extra
  group-label row), so the equivalent ingest here is ``skip_rows=7``.
- The golden YAML's ``exporter_linux`` section is a strict SUBSET of
  the CSV's linux rows (the golden file is a snapshot from a smaller
  corpus run) → subset assertions, not equality.
- The reference emits ``ssh_banner`` when the ``ssh-banner`` cell is
  TRUE **or blank** (``if row['ssh-banner']:`` is truthy for NaN —
  workbook_exporter-fe.py:281); the derivation below mirrors that
  observed behavior so every golden blackbox target is accounted for.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

DUMMY = "/root/reference/dummy_data/dummy_data.csv"
GOLDEN = "/root/reference/dummy_data/example_output.yaml"


@pytest.fixture(scope="module")
def golden():
    import yaml

    with open(GOLDEN) as f:
        return yaml.safe_load(f)


@pytest.fixture(scope="module")
def workbook(ray_session):
    from workbook_exporter_fe_ray.sources import read_auto

    return read_auto(DUMMY, skip_rows=7).materialize()


def test_banner_skip_parses_real_header(workbook):
    cols = workbook.schema().names
    assert "FQDN" in cols and "Exporter_name_os" in cols and "icmp" in cols
    assert workbook.count() == 114


def test_windows_hosts_subset_of_golden(workbook, golden):
    got = set(
        r["FQDN"]
        for r in workbook.filter(
            expr="Exporter_name_os == 'exporter_windows'"
        )
        .select_columns(["FQDN"])
        .take_all()
    )
    assert got  # non-trivial
    assert got <= set(golden["exporter_windows"])


def test_linux_hosts_cover_golden(workbook, golden):
    got = set(
        r["Hostnames"]
        for r in workbook.filter(expr="Exporter_name_os == 'exporter_linux'")
        .select_columns(["Hostnames"])
        .take_all()
    )
    assert set(golden["exporter_linux"]) <= got


def test_blackbox_probe_fanout_derives_golden(workbook, golden):
    """Every (host, target, module, location, country) in the golden
    blackbox section must be produced by the engine's vectorized
    probe fan-out over the ingested rows (F8 semantics on real data)."""

    def _fan(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        fqdn = b["FQDN"]
        ip = pc.cast(b["IP Address"], pa.string())
        loc = b["Location"]
        country = pc.cast(b["Country"], pa.string())
        icmp = pc.fill_null(pc.cast(b["icmp"], pa.bool_()), False)
        # reference truthiness: blank ssh-banner still emits (NaN is truthy)
        ssh = pc.fill_null(pc.cast(b["ssh-banner"], pa.bool_()), True)
        parts = []
        for mask, module, target in [
            (icmp, "icmp", ip),
            (ssh, "ssh_banner", pc.binary_join_element_wise(ip, "22", ":")),
        ]:
            m = mask.to_numpy(zero_copy_only=False).astype(bool)
            sel = pa.array(np.flatnonzero(m))
            parts.append(
                pa.table(
                    {
                        "host": fqdn.take(sel),
                        "target": target.take(sel),
                        "module": pa.array([module] * len(sel)),
                        "location": loc.take(sel),
                        "country": country.take(sel),
                    }
                )
            )
        return pa.concat_tables(parts)

    engine = {
        (r["host"], r["target"], r["module"], r["location"], r["country"])
        for r in workbook.map_batches(_fan, batch_format="pyarrow").take_all()
    }
    for host, targets in golden["exporter_blackbox"].items():
        for target, meta in targets.items():
            if meta["module"] not in ("icmp", "ssh_banner"):
                continue
            key = (host, str(target), meta["module"], meta["location"], str(meta["country"]))
            assert key in engine, key


def test_yaml_sink_renders_golden_file_byte_identical():
    """The YAML sink's rendering (OrderedDict representer +
    allow_unicode dump — reference write_yaml semantics,
    workbook_exporter-fe.py:1758-1776) reproduces the ENTIRE golden
    artifact byte-for-byte from its parsed form."""
    from workbook_exporter_fe_ray.sinks import load_yaml_ordered, render_yaml

    raw = open(GOLDEN, encoding="utf8").read()
    assert render_yaml(load_yaml_ordered(raw)) == raw


def test_yaml_sink_linux_end_to_end(workbook, golden, tmp_path):
    """CSV ingest → vectorized linux-section builder → YAML sink. The
    golden snapshot came from an older corpus (different ports and
    credentials), so value assertions are the same subset-facts the
    other golden tests use; the byte-level contract is covered by the
    full-file render test above, plus field ORDER parity here."""
    from workbook_exporter_fe_ray.sinks import (
        linux_section_from_workbook,
        load_yaml_ordered,
        write_yaml_export,
    )

    section = linux_section_from_workbook(workbook)
    out = tmp_path / "output.yaml"
    write_yaml_export(str(out), {"exporter_linux": section})
    back = load_yaml_ordered(out.read_text(encoding="utf8"))

    got = back["exporter_linux"]
    want = golden["exporter_linux"]
    # golden host set is a subset of the CSV corpus
    assert set(want) <= set(got)
    for host, meta in want.items():
        entry = got[host]
        # stable facts across corpus versions: location/country/shape
        assert entry["location"] == meta["location"]
        assert str(entry["country"]) == str(meta["country"])
        assert isinstance(entry["listen_port"], int)
        # field ORDER matches the golden entries exactly
        assert list(entry) == list(meta)
    # credential defaulting mirrors the reference row.get defaults
    assert got["avaya-1-ess"]["username"] == "testy"
    assert got["avaya-1-lsp"]["username"] == "put your username here"

    # merge semantics (reference write_yaml): second write updates in place
    write_yaml_export(
        str(out),
        {"exporter_linux": {"zz-new-host": {"ip_address": "10.0.0.1"}}},
    )
    merged = load_yaml_ordered(out.read_text(encoding="utf8"))["exporter_linux"]
    assert set(want) <= set(merged) and "zz-new-host" in merged

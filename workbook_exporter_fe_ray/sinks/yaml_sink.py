"""YAML export sink — drop-in output parity with the reference app.

The reference renders its result as a nested ``{exporter → host →
fields}`` YAML document via ``yaml.dump(..., allow_unicode=True)`` with
an OrderedDict representer so insertion order is preserved
(workbook_exporter-fe.py:1758-1767 ``write_yaml`` and :1770-1776 the
representer/constructor pair). The engine's canonical output is
partitioned Parquet + manifest; this sink closes the one reference
*artifact* gap (VERDICT r2 item 6) by rendering any rolled-up /
dimension-sized table to the same byte shape.

Scale note: a YAML document is a driver-side artifact by nature — this
sink is for dimension-sized config exports (the reference's entire
domain is a ~100-row workbook), never for fact tables. The builder
helpers below therefore ``take_all()`` deliberately and say so.
"""

from __future__ import annotations

from collections import OrderedDict

import yaml

import pyarrow as pa


class _OrderedDumper(yaml.Dumper):
    """Dumper that emits OrderedDict as a plain map in insertion order —
    the same behavior the reference installs globally via
    ``yaml.add_representer`` (workbook_exporter-fe.py:1770-1771)."""


_OrderedDumper.add_representer(
    OrderedDict, lambda dumper, data: dumper.represent_dict(data.items())
)


class _OrderedLoader(yaml.SafeLoader):
    """Loader that preserves mapping order (reference
    workbook_exporter-fe.py:1773-1776) so an existing export can be
    merged without reshuffling entries."""


_OrderedLoader.add_constructor(
    yaml.resolver.BaseResolver.DEFAULT_MAPPING_TAG,
    lambda loader, node: OrderedDict(loader.construct_pairs(node)),
)


def render_yaml(sections) -> str:
    """Render nested ordered maps exactly as the reference's
    ``yaml.dump(existing_yaml_output, f, allow_unicode=True)`` does."""
    return yaml.dump(sections, Dumper=_OrderedDumper, allow_unicode=True)


def load_yaml_ordered(text: str) -> OrderedDict:
    """Parse YAML preserving mapping order (empty doc → empty map)."""
    out = yaml.load(text, Loader=_OrderedLoader)
    return out if out is not None else OrderedDict()


def write_yaml_export(path: str, sections, merge_existing: bool = True) -> None:
    """Write (or merge-update) a YAML export file.

    Merge semantics mirror the reference ``write_yaml``
    (workbook_exporter-fe.py:1758-1767): per top-level section, new
    host entries update the existing map in place.
    """
    existing: OrderedDict = OrderedDict()
    if merge_existing:
        try:
            with open(path, encoding="utf8") as f:
                existing = load_yaml_ordered(f.read())
        except FileNotFoundError:
            pass
    for section, hosts in sections.items():
        existing.setdefault(section, OrderedDict()).update(hosts)
    with open(path, "w", encoding="utf8") as f:
        f.write(render_yaml(existing))


# field order pinned to the golden snapshot
# (dummy_data/example_output.yaml exporter_linux entries)
_LINUX_FIELDS = ("ip_address", "listen_port", "location", "country", "username", "password")


def linux_section_from_workbook(
    workbook,
    host_col: str = "Hostnames",
    default_username: str = "put your username here",
    default_password: str = "put your password here",
) -> OrderedDict:
    """Build the ``exporter_linux`` section from an ingested workbook
    Dataset — the engine-side equivalent of the reference's per-row
    loop (workbook_exporter-fe.py:182-210): filter to linux rows,
    project/derive the six golden fields vectorized, assemble the
    (dimension-sized — this is a config workbook, take_all is the
    point) nested map keyed by hostname, sorted like the reference's
    ``sorted_yaml_output`` (workbook_exporter-fe.py:212)."""
    import pyarrow.compute as pc

    def _project(b: pa.Table) -> pa.Table:
        def _with_default(col: str, default: str):
            s = pc.fill_null(pc.cast(b[col], pa.string()), "")
            return pc.if_else(pc.equal(s, ""), default, s)

        port = pc.cast(pc.cast(b["OS-Listen-Port"], pa.float64()), pa.int64())
        user = _with_default("ssh_username", default_username)
        pw = _with_default("ssh_password", default_password)
        return pa.table(
            {
                "host": b[host_col],
                "ip_address": pc.cast(b["IP Address"], pa.string()),
                "listen_port": port,
                "location": b["Location"],
                "country": pc.cast(b["Country"], pa.string()),
                "username": user,
                "password": pw,
            }
        )

    rows = (
        workbook.filter(expr="Exporter_name_os == 'exporter_linux'")
        .map_batches(_project, batch_format="pyarrow")
        .take_all()
    )
    section: OrderedDict = OrderedDict()
    for r in sorted(rows, key=lambda r: r["host"]):
        section[r["host"]] = OrderedDict((f, r[f]) for f in _LINUX_FIELDS)
    return section

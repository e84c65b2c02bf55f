"""Minimal WordprocessingML (.docx) text reader — stdlib zip + XML.

The reference's upload surface ALLOWS ``.docx`` but never parses it
(``/root/reference/workbook_exporter-fe.py:1928`` lists it in
ALLOWED_EXTENSIONS; no branch of ``read_input_file`` handles it) — an
upload silently dies at the pandas dispatch. The engine goes one
honest step further: a .docx is a zip whose main part
``word/document.xml`` holds ``<w:p>`` paragraphs of ``<w:r>`` runs with
literal text in ``<w:t>``, tabs as ``<w:tab/>`` and line breaks as
``<w:br/>`` (ECMA-376 part 1 §17.3) — exactly the stdlib zip+XML shape
``sources/xlsx.py`` already reads, so document uploads can feed the
text pipeline (lang-ID, quality, dedup) as one row per paragraph.

Scale contract matches the other workbook readers: uploads are small
(the reference caps them at 16–100 MB), parsed driver-side, then
handed to Ray as a Dataset.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
import zipfile

import pyarrow as pa

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def _para_text(p: ET.Element) -> str:
    """Concatenate a paragraph's run text; tab → \\t, break → \\n.

    Tags are matched by localname so documents written with a
    non-standard namespace prefix (or the strict-conformance namespace)
    still read; only w:t text nodes inside the paragraph contribute.
    """
    parts: list[str] = []
    for el in p.iter():
        tag = el.tag.rsplit("}", 1)[-1]
        if tag == "t":
            parts.append(el.text or "")
        elif tag == "tab":
            parts.append("\t")
        elif tag in ("br", "cr"):
            parts.append("\n")
    return "".join(parts)


def read_docx_table(path: str) -> pa.Table:
    """Read a .docx into (para_id:int64, text:string) — one row per
    non-empty paragraph, document order."""
    with zipfile.ZipFile(path) as z:
        try:
            raw = z.read("word/document.xml")
        except KeyError as e:
            raise ValueError(
                f"{path!r} has no word/document.xml — not a .docx package"
            ) from e
    root = ET.fromstring(raw)
    texts: list[str] = []
    for p in root.iter():
        if p.tag.rsplit("}", 1)[-1] == "p":
            t = _para_text(p)
            if t:
                texts.append(t)
    return pa.table(
        {
            "para_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def write_docx(path: str, paragraphs: list[str]) -> str:
    """Write a minimal valid .docx (tests + fixtures; the same
    writer-based strategy as the .xls reader's CFB builder). Tabs and
    newlines inside a paragraph round-trip through w:tab / w:br."""

    def esc(s: str) -> str:
        return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    body = []
    for text in paragraphs:
        runs = []
        # split into literal segments and tab/br control chars
        seg = ""
        for ch in text:
            if ch in ("\t", "\n"):
                if seg:
                    runs.append(f'<w:t xml:space="preserve">{esc(seg)}</w:t>')
                    seg = ""
                runs.append("<w:tab/>" if ch == "\t" else "<w:br/>")
            else:
                seg += ch
        if seg:
            runs.append(f'<w:t xml:space="preserve">{esc(seg)}</w:t>')
        body.append(f"<w:p><w:r>{''.join(runs)}</w:r></w:p>")
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W[1:-1]}"><w:body>'
        f"{''.join(body)}</w:body></w:document>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/word/document.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
        "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", rels)
        z.writestr("word/document.xml", doc)
    return path


def synth_docx_fixture(path: str, n_paras: int = 400, seed: int = 131) -> str:
    """Deterministic .docx ingest fixture + a CSV twin (same dir,
    ``.csv`` suffix) holding the identical paragraph texts — the twin
    is what a SQL oracle can read, so a hash match proves the
    WordprocessingML extraction is byte-identical. ASCII words only
    (control-char runs are covered by the roundtrip pytest instead;
    CSV quoting of tabs/newlines would test the oracle's CSV parser,
    not this reader)."""
    import csv
    import os

    import numpy as np

    csv_path = os.path.splitext(path)[0] + ".csv"
    if os.path.isfile(path) and os.path.isfile(csv_path):
        return path
    rng = np.random.default_rng(seed)
    vocab = [
        "alpha", "beta", "gamma", "delta", "metric", "export", "tier",
        "rollup", "host", "port", "probe", "batch", "shard", "window",
    ]
    paras = []
    for i in range(n_paras):
        k = int(rng.integers(3, 24))
        words = [vocab[int(j)] for j in rng.integers(0, len(vocab), k)]
        paras.append(f"p{i:04d} " + " ".join(words))
    write_docx(path, paras)
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["para_id", "text"])
        for i, t in enumerate(paras):
            w.writerow([i, t])
    return path


def synth_yaml_fixture(path: str, seed: int = 137) -> str:
    """Deterministic prior-export .eyaml fixture + CSV twin of its flat
    (section, host, field, value) rows, rendered through the sink's own
    dumper so the reader is exercised against real sink output."""
    import csv
    import os
    from collections import OrderedDict

    import numpy as np

    from ..sinks.yaml_sink import render_yaml

    csv_path = os.path.splitext(path)[0] + ".csv"
    if os.path.isfile(path) and os.path.isfile(csv_path):
        return path
    rng = np.random.default_rng(seed)
    doc = OrderedDict()
    rows = []
    for s in range(6):
        sec = f"exporter_{s}"
        hosts = OrderedDict()
        for h in range(int(rng.integers(3, 20))):
            host = f"host{s}{h:02d}.example.com"
            fields = OrderedDict(
                [
                    ("port", str(9100 + int(rng.integers(0, 50)))),
                    ("done", "yes" if int(rng.integers(0, 2)) else "no"),
                    ("weight", str(int(rng.integers(1, 1000)))),
                ]
            )
            hosts[host] = fields
            for fld, val in fields.items():
                rows.append((sec, host, fld, val))
        doc[sec] = hosts
    with open(path, "w", encoding="utf-8") as f:
        f.write(render_yaml(doc))
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["section", "host", "field", "value"])
        w.writerows(rows)
    return path

"""Legacy .xls (BIFF8) reader: parse files built by a self-contained
[MS-CFB]/[MS-XLS] writer below — covering the mini-stream (< 4 KiB) and
regular-FAT container layouts, shared strings with a CONTINUE split,
RK/MULRK number decoding, booleans, and the read_auto dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from workbook_exporter_fe_ray.sources.xls import read_xls_rows, read_xls_table

END, FREE, FATSECT = 0xFFFFFFFE, 0xFFFFFFFF, 0xFFFFFFFD


# ---------------------------------------------------------------------------
# minimal BIFF8 + CFB writer (test fixture only)
# ---------------------------------------------------------------------------


def _rec(typ: int, payload: bytes) -> bytes:
    return struct.pack("<HH", typ, len(payload)) + payload


def _xl_str(s: str) -> bytes:
    wide = any(ord(c) > 255 for c in s)
    data = s.encode("utf-16-le" if wide else "latin-1")
    return struct.pack("<HB", len(s), 1 if wide else 0) + data


def _rk_from_int(v: int) -> int:
    return ((v & 0x3FFFFFFF) << 2) | 2


def build_workbook_stream(sheets: dict[str, list[list]], split_sst: bool = False) -> bytes:
    strings: list[str] = []
    six: dict[str, int] = {}
    total_refs = 0
    sheet_cells: list[bytes] = []
    for rows in sheets.values():
        recs = b""
        for r, row in enumerate(rows):
            mulrk_cols = [
                c for c, v in enumerate(row) if isinstance(v, tuple) and v[0] == "rk"
            ]
            for c, v in enumerate(row):
                if v is None:
                    continue
                if isinstance(v, tuple) and v[0] == "rk":
                    continue  # handled as a MULRK run below
                if isinstance(v, bool):
                    recs += _rec(0x0205, struct.pack("<HHHBB", r, c, 0, int(v), 0))
                elif isinstance(v, (int, float)):
                    recs += _rec(0x0203, struct.pack("<HHHd", r, c, 0, float(v)))
                else:
                    if v not in six:
                        six[v] = len(strings)
                        strings.append(v)
                    total_refs += 1
                    recs += _rec(0x00FD, struct.pack("<HHHI", r, c, 0, six[v]))
            if mulrk_cols:  # contiguous rk run → one MULRK record
                c0, c1 = mulrk_cols[0], mulrk_cols[-1]
                body = struct.pack("<HH", r, c0)
                for c in range(c0, c1 + 1):
                    body += struct.pack("<HI", 0, _rk_from_int(row[c][1]))
                body += struct.pack("<H", c1)
                recs += _rec(0x00BD, body)
        sheet_cells.append(recs)

    if split_sst and strings:
        # split the LAST string's character data across a CONTINUE
        # record (grbit re-stated by the continued fragment)
        head = struct.pack("<II", total_refs, len(strings))
        head += b"".join(_xl_str(s) for s in strings[:-1])
        last = strings[-1]
        data = last.encode("latin-1")
        cut = max(len(data) // 2, 1)
        head += struct.pack("<HB", len(last), 0) + data[:cut]
        sst = _rec(0x00FC, head)
        sst += _rec(0x003C, b"\x00" + data[cut:])
    else:
        payload = struct.pack("<II", total_refs, len(strings))
        payload += b"".join(_xl_str(s) for s in strings)
        sst = _rec(0x00FC, payload)

    bof_g = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0x0DBB, 0x07CC, 0, 0))
    bof_s = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0x0DBB, 0x07CC, 0, 0))
    names = list(sheets)
    sheet_streams = [bof_s + cells + _rec(0x000A, b"") for cells in sheet_cells]

    def _bound(name: str, off: int) -> bytes:
        return _rec(
            0x0085,
            struct.pack("<IBB", off, 0, 0)
            + struct.pack("<BB", len(name), 0)
            + name.encode("latin-1"),
        )

    # two-pass: bound records have fixed size once names are known
    dummy = b"".join(_bound(n, 0) for n in names)
    globals_len = len(bof_g) + len(dummy) + len(sst) + 4  # + EOF
    offs, pos = [], globals_len
    for ss in sheet_streams:
        offs.append(pos)
        pos += len(ss)
    out = bof_g + b"".join(_bound(n, o) for n, o in zip(names, offs)) + sst
    out += _rec(0x000A, b"")
    assert len(out) == globals_len
    return out + b"".join(sheet_streams)


def _dirent(name: str, etype: int, start: int, size: int, child: int = FREE) -> bytes:
    raw = name.encode("utf-16-le") + b"\x00\x00"
    e = raw.ljust(64, b"\x00")
    e += struct.pack("<HBB", len(raw), etype, 1)
    e += struct.pack("<III", FREE, FREE, child)
    e += b"\x00" * 16 + struct.pack("<I", 0) + b"\x00" * 16
    e += struct.pack("<IQ", start, size)
    assert len(e) == 128
    return e


def build_cfb(stream: bytes) -> bytes:
    """Single-stream ('Workbook') compound document; mini stream when
    the payload is < 4096 bytes, regular FAT chain otherwise."""

    def pad(b: bytes, n: int = 512) -> bytes:
        return b + b"\x00" * (-len(b) % n)

    mini = len(stream) < 4096
    if mini:
        m = max((len(stream) + 63) // 64, 1)
        ministream = pad(stream, 64)
        c = (len(ministream) + 511) // 512
        fat = [FATSECT, END, END] + [3 + i + 1 for i in range(c - 1)] + [END]
        fat += [FREE] * (128 - len(fat))
        minifat = [i + 1 for i in range(m - 1)] + [END]
        minifat += [FREE] * (128 - len(minifat))
        dirsec = _dirent("Root Entry", 5, 3, m * 64, child=1) + _dirent(
            "Workbook", 2, 0, len(stream)
        )
        sectors = (
            pad(struct.pack(f"<{len(fat)}I", *fat))
            + pad(dirsec)
            + pad(struct.pack(f"<{len(minifat)}I", *minifat))
            + pad(ministream)
        )
        first_minifat, num_minifat = 2, 1
    else:
        k = (len(stream) + 511) // 512
        fat = [FATSECT, END] + [2 + i + 1 for i in range(k - 1)] + [END]
        assert len(fat) <= 128, "test writer: stream too large for one FAT sector"
        fat += [FREE] * (128 - len(fat))
        dirsec = _dirent("Root Entry", 5, END & 0xFFFFFFFF, 0, child=1) + _dirent(
            "Workbook", 2, 2, len(stream)
        )
        sectors = pad(struct.pack(f"<{len(fat)}I", *fat)) + pad(dirsec) + pad(stream)
        first_minifat, num_minifat = END, 0

    hdr = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 16
    hdr += struct.pack("<HHHHHH", 0x003E, 0x0003, 0xFFFE, 9, 6, 0)
    hdr += struct.pack("<IIIII", 0, 0, 1, 1, 0)  # ... num_fat=1, first_dir=1
    hdr += struct.pack("<IIIII", 4096, first_minifat, num_minifat, END & 0xFFFFFFFF, 0)
    difat = [0] + [FREE] * 108
    hdr += struct.pack("<109I", *difat)
    assert len(hdr) == 512
    return hdr + sectors


def _write(tmp_path, name: str, sheets: dict, pad_rows: int = 0, **kw) -> str:
    if pad_rows:  # force the regular-FAT (>4 KiB) container path
        key = list(sheets)[0]
        sheets[key] = sheets[key] + [
            [f"pad-{i}.test.org", f"10.0.0.{i}", float(i), bool(i % 2)]
            for i in range(pad_rows)
        ]
    p = tmp_path / name
    p.write_bytes(build_cfb(build_workbook_stream(sheets, **kw)))
    return str(p)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

SHEET = [
    ["FQDN", "IP Address", "Port", "Done"],
    ["host-a.test.org", "192.168.1.1", 3401, True],
    ["host-b.test.org", "192.168.1.2", 3402.5, False],
    [None, "192.168.1.3", ("rk", 7), None],
    [("rk", 100), ("rk", 200), ("rk", 300), "end"],
]


def test_xls_ministream_roundtrip(tmp_path):
    p = _write(tmp_path, "mini.xls", {"Sheet1": [r[:] for r in SHEET]})
    rows = read_xls_rows(p)
    assert rows[0] == ["FQDN", "IP Address", "Port", "Done"]
    assert rows[1] == ["host-a.test.org", "192.168.1.1", 3401, True]
    assert rows[2][2] == 3402.5 and rows[2][3] is False
    assert rows[3] == [None, "192.168.1.3", 7, None]  # RK via MULRK... single
    assert rows[4] == [100, 200, 300, "end"]  # MULRK run decode


def test_xls_regular_fat_and_table(tmp_path):
    clean = [SHEET[0], SHEET[1], ["host-b.test.org", "192.168.1.2", 3402.5, False]]
    p = _write(tmp_path, "big.xls", {"Sheet1": clean}, pad_rows=400)
    t = read_xls_table(p, skip_rows=0)
    assert t.num_rows == 2 + 400
    assert t.column_names == ["FQDN", "IP Address", "Port", "Done"]
    assert t["FQDN"][0].as_py() == "host-a.test.org"
    assert t["Port"][1].as_py() == 3402.5


def test_xls_sst_continue_split_and_sheets(tmp_path):
    sheets = {
        "First": [["alpha", "a-very-long-shared-string-value-that-splits"]],
        "Second": [["beta", 42]],
    }
    p = _write(tmp_path, "multi.xls", sheets, split_sst=True)
    assert read_xls_rows(p, "First")[0][1] == (
        "a-very-long-shared-string-value-that-splits"
    )
    assert read_xls_rows(p, "Second")[0] == ["beta", 42]
    with pytest.raises(ValueError):
        read_xls_rows(p, "Nope")


def test_read_auto_dispatches_xls(tmp_path, ray_session):
    from workbook_exporter_fe_ray.sources import read_auto

    p = _write(tmp_path, "auto.xls", {"Sheet1": [r[:] for r in SHEET[:3]]})
    ds = read_auto(p)
    df = ds.to_pandas()
    assert list(df.columns) == ["FQDN", "IP Address", "Port", "Done"]
    assert len(df) == 2
    assert df["Port"].tolist() == [3401, 3402.5]

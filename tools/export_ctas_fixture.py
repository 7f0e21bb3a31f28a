#!/usr/bin/env python3
"""One-time dev tool: export the reference's packaged fixture
(/root/reference/data/ctas_data.rda) to CSV files under
src/test/resources/ctas_fixture/ for the ReferenceParitySpec.

The .rda is bzip2-compressed RDX2 (XDR) — R's public serialization
format, documented in the "R Internals" manual ("Serialization
Formats"). This is a minimal reader for the subset the fixture uses:
pairlists, symbols, character/integer/real/logical vectors, generic
vectors (lists / data.frames), attributes, and the reference table.

Usage: python3 tools/export_ctas_fixture.py [rda_path] [out_dir]
"""
import bz2
import os
import struct
import sys

INT_NA = -2147483648


class Reader:
    def __init__(self, data):
        self.d = data
        self.p = 0
        self.refs = []

    def i4(self):
        v = struct.unpack(">i", self.d[self.p:self.p + 4])[0]
        self.p += 4
        return v

    def f8(self):
        v = struct.unpack(">d", self.d[self.p:self.p + 8])[0]
        self.p += 8
        return v

    def raw(self, n):
        v = self.d[self.p:self.p + n]
        self.p += n
        return v

    def item(self):
        flags = self.i4()
        t = flags & 255
        has_attr = bool(flags & (1 << 9))
        has_tag = bool(flags & (1 << 10))

        if t == 254:  # NILVALUE
            return None
        if t == 255:  # REFSXP
            idx = flags >> 8
            if idx == 0:
                idx = self.i4()
            return self.refs[idx - 1]
        if t == 1:  # SYMSXP
            name = self.item()  # CHARSXP
            self.refs.append(name)
            return name
        if t in (2, 6):  # LISTSXP / LANGSXP (pairlist)
            attr = self.item() if has_attr else None
            tag = self.item() if has_tag else None
            car = self.item()
            cdr = self.item()
            return ("pairlist", tag, car, cdr, attr)
        if t == 9:  # CHARSXP
            n = self.i4()
            if n == -1:
                return None  # NA_character_
            return self.raw(n).decode("utf-8")
        if t == 10:  # LGLSXP
            n = self.i4()
            vals = [self.i4() for _ in range(n)]
            vals = [None if v == INT_NA else bool(v) for v in vals]
            return self._with_attr(vals, has_attr)
        if t == 13:  # INTSXP
            n = self.i4()
            vals = [self.i4() for _ in range(n)]
            vals = [None if v == INT_NA else v for v in vals]
            return self._with_attr(vals, has_attr)
        if t == 14:  # REALSXP
            n = self.i4()
            vals = [self.f8() for _ in range(n)]
            return self._with_attr(vals, has_attr)
        if t == 16:  # STRSXP
            n = self.i4()
            vals = [self.item() for _ in range(n)]
            return self._with_attr(vals, has_attr)
        if t == 19:  # VECSXP (generic vector: list / data.frame)
            n = self.i4()
            vals = [self.item() for _ in range(n)]
            return self._with_attr(vals, has_attr)
        raise ValueError(f"unhandled SEXP type {t} at offset {self.p}")

    def _with_attr(self, vals, has_attr):
        attrs = {}
        if has_attr:
            a = self.item()
            while a is not None:
                _, tag, car, cdr, _ = a
                attrs[tag] = car
                a = cdr
        return ("vec", vals, attrs)


def unwrap(v):
    """('vec', vals, attrs) -> (vals, attrs)"""
    if isinstance(v, tuple) and v and v[0] == "vec":
        return v[1], v[2]
    return v, {}


def df_to_rows(df):
    """R data.frame -> (colnames, rows of python values)."""
    cols, attrs = unwrap(df)
    names, _ = unwrap(attrs["names"])
    out_cols = []
    for c in cols:
        vals, cattrs = unwrap(c)
        if "levels" in cattrs:  # factor -> strings
            levels, _ = unwrap(cattrs["levels"])
            vals = [None if v is None else levels[v - 1] for v in vals]
        out_cols.append(vals)
    nrow = len(out_cols[0]) if out_cols else 0
    rows = [[col[i] for col in out_cols] for i in range(nrow)]
    return names, rows


def fmt(v):
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return ""  # R NA_real_ / NaN -> empty (fixture has no real NaN)
        return repr(v)
    s = str(v)
    if any(ch in s for ch in ",\"\n"):
        s = '"' + s.replace('"', '""') + '"'
    return s


def main():
    rda = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/data/ctas_data.rda"
    out = sys.argv[2] if len(sys.argv) > 2 else "src/test/resources/ctas_fixture"
    data = bz2.open(rda, "rb").read()
    assert data[:5] == b"RDX2\n", data[:5]
    r = Reader(data[5:])
    fmt_marker = r.raw(2)
    assert fmt_marker == b"X\n", fmt_marker
    r.i4(), r.i4(), r.i4()  # version, writer, min-reader
    top = r.item()
    _, tag, car, _, _ = top
    assert tag == "ctas_data", tag
    tables, attrs = unwrap(car)
    names, _ = unwrap(attrs["names"])
    os.makedirs(out, exist_ok=True)
    for name, df in zip(names, tables):
        cols, rows = df_to_rows(df)
        path = os.path.join(out, f"{name}.csv")
        with open(path, "w") as f:
            f.write(",".join(cols) + "\n")
            for row in rows:
                f.write(",".join(fmt(v) for v in row) + "\n")
        print(f"{name}: {len(rows)} rows x {len(cols)} cols -> {path}")


if __name__ == "__main__":
    main()

"""Baseline-JPEG (SOF0) pixel codec — pure Python + numpy, no codec lib.

JPEG's entropy layer (canonical Huffman over (run,size) symbols) and its
transform (8x8 DCT-II) are fully specified in ITU T.81 and need no
library: the bit reader, table builder, dequantizer and IDCT are plain
arithmetic. This module implements a GENERIC baseline decoder — it
parses whatever DQT/DHT tables the stream carries, handles multi-table
segments, 0xFF00 byte stuffing, restart intervals (DRI + RSTn), 4:4:4
and subsampled layouts (chroma replicated up), grayscale and 3-component
color, and non-multiple-of-8 dimensions (decode full MCUs, crop) — and a
real two-pass ENCODER used by the fixture staging (collect the actually
emitted symbols, build canonical tables, entropy-code the quantized
coefficients). Encoder and decoder share only the public zigzag/IDCT
constants — the entropy paths are forward vs inverse with no common
code, so a bug cannot cancel out.

Out of scope, loudly: progressive JPEG (SOF2) and arithmetic coding
raise ValueError (quarantine), as do 12-bit precision and fractional
sampling ratios. Reference parity: the reference engine has no media
decode at all (reference sync.py is a SQL-dump differ); this module is
part of the training-data-pipeline surface SURVEY.md §2 B11 adds on top.

Exactness contract for the fixture family (what lets a DuckDB oracle
recompute decoded sums with integer arithmetic): quantized coefficients
live only at zigzag 0 / (u=4,v=0) / (u=0,v=4) with quantizer step 8, so
the IDCT basis values are ±1/8·8 = ±1 exactly and every decoded luma
sample is an integer hit dead-on by float (error ~1e-13, never near the
round boundary); chroma is block-constant with offsets chosen so the
1.402/0.344136/0.714136 color products never land on .5.
"""

from __future__ import annotations

import struct

import numpy as np

#: zigzag index -> (row v, col u), ITU T.81 Figure 5
ZIGZAG = (
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
)

#: refuse to decode frames beyond ~16.7 Mpx (4096x4096): the decoder
#: allocates float64 planes from the DECLARED SOF dims, so a cap is the
#: quarantine contract's defense against adversarial headers
_MAX_PIXELS = 1 << 24

#: IDCT basis M[x, u] = C(u)/2 * cos((2x+1)u*pi/16); spatial = M @ F @ M.T
_IDCT_M = np.array(
    [[(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
      * np.cos((2 * x + 1) * u * np.pi / 16.0)
      for u in range(8)] for x in range(8)])


# --- decoder ---------------------------------------------------------------

class _BitReader:
    """MSB-first entropy-segment reader with 0xFF00 unstuffing. Only a
    stuffed 0x00 continues the bit stream; ANY other marker byte —
    RSTn included — raises (restarts are consumed explicitly at their
    expected MCU boundary via align_and_expect_rst; an RST anywhere
    else is treated as corruption, not a resync point)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("corrupt JPEG: entropy data ran out")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("corrupt JPEG: dangling 0xFF")
                m = self.data[self.pos]
                if m == 0x00:
                    self.pos += 1  # stuffed data byte
                else:
                    raise ValueError(
                        f"corrupt JPEG: marker FF{m:02X} inside scan")
            self.bits = b
            self.nbits = 8
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align, then consume the RSTn marker (restart interval)."""
        self.nbits = 0
        if (self.pos + 2 > len(self.data)
                or self.data[self.pos] != 0xFF
                or self.data[self.pos + 1] != 0xD0 + (n & 7)):
            raise ValueError(
                f"corrupt JPEG: expected RST{n & 7} at {self.pos}")
        self.pos += 2


def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical (length, code) -> symbol map from a DHT BITS/HUFFVAL
    pair (the T.81 Annex C code-assignment algorithm)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                raise ValueError("corrupt JPEG: DHT count exceeds symbols")
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("corrupt JPEG: invalid Huffman code")


def _extend(r: int, s: int) -> int:
    if s == 0:
        return 0
    return r if r >= (1 << (s - 1)) else r - (1 << s) + 1


def decode_jpeg_pixels(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, raw RGB bytes) from a baseline (SOF0) JPEG — a
    REAL generic decoder: marker walk, DQT/DHT table parse, Huffman
    entropy decode with byte unstuffing and restart markers, dequantize,
    de-zigzag, float IDCT, subsampled-chroma replication, YCbCr->RGB.
    Grayscale replicates Y into all three channels. Raises ValueError on
    structural corruption or non-baseline streams (quarantine, never
    garbage pixels)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}  # (class, id) -> huffman map
    frame = None
    restart = 0
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise ValueError(f"corrupt JPEG: bad marker at {i}")
        marker = data[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xC2, 0xC6, 0xCA, 0xCE):
            raise ValueError("progressive JPEG (SOF2-family) unsupported")
        if marker in (0xC9, 0xCB, 0xCD):
            raise ValueError("arithmetic-coded JPEG unsupported")
        seglen = int.from_bytes(data[i + 2:i + 4], "big")
        if seglen < 2 or i + 2 + seglen > len(data):
            raise ValueError(f"corrupt JPEG: bad segment length at {i}")
        body = data[i + 4:i + 2 + seglen]
        if marker == 0xDB:  # DQT, possibly several tables per segment
            p = 0
            while p < len(body):
                prec, tid = body[p] >> 4, body[p] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                if p + 65 > len(body):
                    raise ValueError("corrupt JPEG: truncated DQT")
                q = np.zeros((8, 8))
                for z in range(64):
                    v, u = ZIGZAG[z]
                    q[v, u] = body[p + 1 + z]
                qtabs[tid] = q
                p += 65
        elif marker == 0xC4:  # DHT, possibly several tables per segment
            p = 0
            while p + 17 <= len(body):
                cls, tid = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                vals = body[p + 17:p + 17 + n]
                if len(vals) < n:
                    raise ValueError("corrupt JPEG: truncated DHT")
                htabs[(cls, tid)] = _build_huffman(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            if len(body) < 6:
                raise ValueError("corrupt JPEG: truncated SOF")
            if body[0] != 8:
                raise ValueError("non-8-bit JPEG precision unsupported")
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("corrupt JPEG: truncated SOF")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            if not width or not height or ncomp not in (1, 3):
                raise ValueError("corrupt JPEG: bad SOF dimensions")
            # allocation guard: planes are materialized as float64 from
            # the DECLARED dims before any entropy byte is read, so an
            # adversarial 300-byte header claiming 65535x65535 must
            # quarantine (ValueError), not OOM the executor
            if width * height > _MAX_PIXELS:
                raise ValueError(
                    f"JPEG dimensions {width}x{height} exceed the "
                    f"{_MAX_PIXELS}-pixel decode limit")
            frame = (width, height, comps)
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            if not body:
                raise ValueError("corrupt JPEG: empty SOS")
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("corrupt JPEG: truncated SOS")
            scan_tabs = {}
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan_tabs[cid] = (tt >> 4, tt & 0x0F)
            return _decode_scan(data, i + 2 + seglen, frame, scan_tabs,
                                qtabs, htabs, restart)
        i += 2 + seglen
    raise ValueError("corrupt JPEG: no SOS before EOF")


def _decode_scan(data, pos, frame, scan_tabs, qtabs, htabs, restart):
    width, height, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if not 1 <= c["h"] <= 4 or not 1 <= c["v"] <= 4:
            raise ValueError(
                f"corrupt JPEG: sampling factor {c['h']}x{c['v']}")
        if hmax % c["h"] or vmax % c["v"]:
            raise ValueError("fractional chroma sampling unsupported")
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)))
    r = _BitReader(data, pos)
    pred = [0] * len(comps)
    n_rst = 0
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            r.align_and_expect_rst(n_rst)
            n_rst = (n_rst + 1) & 7
            pred = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            try:
                dc_t = htabs[(0, scan_tabs[c["id"]][0])]
                ac_t = htabs[(1, scan_tabs[c["id"]][1])]
                q = qtabs[c["tq"]]
            except KeyError:
                raise ValueError("corrupt JPEG: scan references missing "
                                 "Huffman/quant table")
            for b in range(c["h"] * c["v"]):
                by, bx = divmod(b, c["h"])
                F = np.zeros((8, 8))
                s = _huff_decode(r, dc_t)
                if s > 11:
                    raise ValueError(f"corrupt JPEG: DC category {s}")
                pred[ci] += _extend(r.receive(s), s)
                F[0, 0] = pred[ci] * q[0, 0]
                z = 1
                while z < 64:
                    sym = _huff_decode(r, ac_t)
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0x0F
                    if size == 0:
                        if run != 15:
                            raise ValueError(
                                f"corrupt JPEG: AC symbol {sym:02X}")
                        z += 16  # ZRL
                        continue
                    z += run
                    if z > 63:
                        raise ValueError("corrupt JPEG: AC run overflow")
                    v, u = ZIGZAG[z]
                    F[v, u] = _extend(r.receive(size), size) * q[v, u]
                    z += 1
                block = _IDCT_M @ F @ _IDCT_M.T + 128.0
                y0 = (my * c["v"] + by) * 8
                x0 = (mx * c["h"] + bx) * 8
                planes[ci][y0:y0 + 8, x0:x0 + 8] = block
    # replicate subsampled planes up to full resolution, crop to dims
    full = []
    for c, p in zip(comps, planes):
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        full.append(p[:height, :width])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        rgb = np.stack([g, g, g], axis=-1)
    else:
        y, cb, cr = full
        rr = y + 1.402 * (cr - 128.0)
        gg = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bb = y + 1.772 * (cb - 128.0)
        rgb = np.clip(np.round(np.stack([rr, gg, bb], axis=-1)),
                      0, 255).astype(np.uint8)
    return width, height, rgb.tobytes()


# --- encoder (fixture staging; forward path, no shared entropy code) -------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        for k in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self) -> None:
        while self.nacc:
            self.write(1, 1)  # pad with 1-bits per T.81 F.1.2.3


def _category(v: int) -> int:
    return abs(v).bit_length()


def _emit_value(w: _BitWriter, v: int, s: int) -> None:
    if s:
        w.write(v if v >= 0 else v + (1 << s) - 1, s)


def _block_symbols(zz: list[int], prev_dc: int) -> list[tuple[str, int, int]]:
    """Entropy symbols for one quantized block in zigzag order:
    [('dc', category, diff)] + [('ac', runsize, val)...] (+ EOB).
    Generic run-length coding — works for any coefficient content."""
    syms = [("dc", _category(zz[0] - prev_dc), zz[0] - prev_dc)]
    run = 0
    for z in range(1, 64):
        if zz[z] == 0:
            run += 1
            continue
        while run > 15:
            syms.append(("ac", 0xF0, 0))  # ZRL
            run -= 16
        syms.append(("ac", (run << 4) | _category(zz[z]), zz[z]))
        run = 0
    if run:  # trailing zeros (incl. the all-zero-AC block) -> EOB
        syms.append(("ac", 0x00, 0))
    return syms


def _canonical_table(symbols: set[int]) -> tuple[list[int], bytes, dict]:
    """Equal-length canonical Huffman table over the emitted symbol set:
    (BITS, HUFFVAL, symbol -> (code, length)). Length L satisfies
    n <= 2^L - 1 so the all-ones code is never assigned (T.81 C.2)."""
    vals = sorted(symbols)
    n = len(vals)
    length = max(2, (n + 1 - 1).bit_length())
    while (1 << length) - 1 < n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    enc = {sym: (code, length) for code, sym in enumerate(vals)}
    return bits, bytes(vals), enc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


#: quantizer used by the fixture family: step 8 at the three coefficient
#: positions the fixtures populate (exact-integer IDCT), 16 elsewhere
_FIX_Q = {(0, 0): 8, (0, 4): 8, (4, 0): 8}


def encode_jpeg_baseline(width: int, height: int,
                         coef_fn, chroma_dc: int = 0,
                         subsample: bool = False,
                         restart_interval: int = 0) -> bytes:
    """REAL baseline-JPEG encoder for the fixture family: quantized luma
    coefficients come from ``coef_fn(bx, by) -> (a, b, c)`` (zigzag 0 /
    (u=4,v=0) vertical / (u=0,v=4) horizontal), chroma is block-constant
    ``128 + chroma_dc``. Two-pass entropy coding: pass 1 collects the
    exact symbol population, pass 2 writes canonical tables (DHT) and
    the bitstream — DC prediction, run-length AC, byte stuffing, optional
    restart markers and 4:2:0 subsampling. ``width``/``height`` must be
    multiples of 8 (16 when subsampled)."""
    unit = 16 if subsample else 8
    if width % unit or height % unit:
        raise ValueError(f"fixture dims must be multiples of {unit}")
    bw, bh = width // 8, height // 8
    cw, ch = (bw // 2, bh // 2) if subsample else (bw, bh)

    def luma_zz(bx: int, by: int) -> list[int]:
        a, b, c = coef_fn(bx, by)
        zz = [0] * 64
        zz[0] = a
        zz[10] = c   # (v=4, u=0): varies with y
        zz[14] = b   # (v=0, u=4): varies with x
        return zz

    chroma_zz = [chroma_dc] + [0] * 63

    # MCU traversal (shared by both passes): yields (comp, zigzag block)
    def mcus():
        mw = cw if subsample else bw
        mh = ch if subsample else bh
        for my in range(mh):
            for mx in range(mw):
                if subsample:
                    blocks = [(0, luma_zz(2 * mx, 2 * my)),
                              (0, luma_zz(2 * mx + 1, 2 * my)),
                              (0, luma_zz(2 * mx, 2 * my + 1)),
                              (0, luma_zz(2 * mx + 1, 2 * my + 1))]
                else:
                    blocks = [(0, luma_zz(mx, my))]
                blocks += [(1, chroma_zz), (2, chroma_zz)]
                yield blocks

    # pass 1: symbol populations per (class, luma/chroma) table
    pops = {(0, 0): set(), (1, 0): set(), (0, 1): set(), (1, 1): set()}
    pred = [0, 0, 0]
    n_mcu = 0
    for blocks in mcus():
        if restart_interval and n_mcu and n_mcu % restart_interval == 0:
            pred = [0, 0, 0]
        n_mcu += 1
        for comp, zz in blocks:
            t = 0 if comp == 0 else 1
            for kind, sym, _v in _block_symbols(zz, pred[comp]):
                pops[(0 if kind == "dc" else 1, t)].add(sym)
            pred[comp] = zz[0]

    tables = {k: _canonical_table(v) for k, v in pops.items()}

    # headers
    qt = bytearray(64)
    for z in range(64):
        qt[z] = _FIX_Q.get(ZIGZAG[z], 16)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(qt)
                + bytes([0x01]) + bytes(qt))  # two tables, one segment
    hv_y = 0x22 if subsample else 0x11
    out += _seg(0xC0, bytes([8]) + height.to_bytes(2, "big")
                + width.to_bytes(2, "big") + bytes([3])
                + bytes([1, hv_y, 0]) + bytes([2, 0x11, 1])
                + bytes([3, 0x11, 1]))
    dht = bytearray()
    for (cls, tid), (bits, vals, _enc) in sorted(tables.items()):
        dht += bytes([(cls << 4) | tid]) + bytes(bits) + vals
    out += _seg(0xC4, bytes(dht))
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    # pass 2: entropy-coded data
    w = _BitWriter()
    pred = [0, 0, 0]
    n_mcu = 0
    n_rst = 0
    for blocks in mcus():
        if restart_interval and n_mcu and n_mcu % restart_interval == 0:
            w.flush()
            w.out += bytes([0xFF, 0xD0 + n_rst])
            n_rst = (n_rst + 1) & 7
            pred = [0, 0, 0]
        n_mcu += 1
        for comp, zz in blocks:
            t = 0 if comp == 0 else 1
            for kind, sym, v in _block_symbols(zz, pred[comp]):
                cls = 0 if kind == "dc" else 1
                code, length = tables[(cls, t)][2][sym]
                w.write(code, length)
                if kind == "dc":
                    _emit_value(w, v, sym)
                elif sym not in (0x00, 0xF0):
                    _emit_value(w, v, sym & 0x0F)
            pred[comp] = zz[0]
    w.flush()
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)


#: sign of cos((2t+1)*pi/4): +1 for t in {0,3,4,7}, -1 for {1,2,5,6}
def basis_sign(t: int) -> int:
    return 1 if ((t + 1) // 2) % 2 == 0 else -1


#: decoded RGB offsets for chroma_dc d (both Cb and Cr at 128+d), chosen
#: so 1.402d / -1.058272d / 1.772d never round at a .5 boundary:
#: R = Y + round(1.402d), G = Y + round(-1.058272d), B = Y + round(1.772d)
CHROMA_OFFSETS = {
    -4: (-6, 4, -7), -2: (-3, 2, -4), 0: (0, 0, 0),
    2: (3, -2, 4), 4: (6, -4, 7),
}


def fixture_coefs(doc_id: int, bx: int, by: int) -> tuple[int, int, int]:
    """The staged-fixture coefficient formula (mirrored by the DuckDB
    oracle): per-block (a, b, c) with |a|<=60, |b|,|c|<=20 so decoded
    luma 128+a+b*sx+c*sy stays in [28, 228] — no clamping, and the
    chroma offsets (<=7) cannot push a channel out of range either."""
    a = (doc_id * 7 + bx * 3 + by * 5) % 121 - 60
    b = (doc_id + bx * 11 + by) % 41 - 20
    c = (doc_id * 13 + bx + by * 17) % 41 - 20
    return a, b, c


def synth_jpeg_fixture(doc_id: int) -> bytes:
    """Deterministic REAL baseline JPEG for one doc: dims 8·(1+id%4) x
    8·(1+id%3), per-block coefficients from fixture_coefs, chroma DC
    2·((id%5)-2) in {-4..4}, every third doc 4:2:0-subsampled (dims
    bumped to 16-multiples), every fourth doc with restart interval 2.
    Decoded pixel (x, y): Y = 128 + a + b·sx(x%8) + c·sy(y%8) with
    sx/sy = basis_sign, then R/G/B = Y + CHROMA_OFFSETS[d]."""
    sub = doc_id % 3 == 0
    width = (16 if sub else 8) * (1 + doc_id % 4)
    height = (16 if sub else 8) * (1 + doc_id % 3)
    d = 2 * ((doc_id % 5) - 2)
    rst = 2 if doc_id % 4 == 0 else 0
    return encode_jpeg_baseline(
        width, height,
        lambda bx, by: fixture_coefs(doc_id, bx, by),
        chroma_dc=d, subsample=sub, restart_interval=rst)

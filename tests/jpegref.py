"""TEST-ONLY baseline-JPEG codec (ITU-T T.81, public spec): a minimal
pure-numpy sequential-DCT Huffman decoder plus a matching
single-purpose encoder used to manufacture REAL JPEG payloads inside
the test suite.

Exists to prove the engine's external-codec adapter seam
(operators/multimodal.register_decoder) end-to-end against a genuine
codec: this container ships neither PIL nor libjpeg, so without it the
adapter registry was only exercised by stub adapters (r11 verdict).
It is NOT part of the engine — production deployments register PIL via
``register_default_adapters()``; this module lives in ``tests/`` and
supports only the common baseline layouts (8-bit precision, SOF0,
grayscale / 4:4:4 / 4:2:0, no progressive scans, no restart
intervals). Everything else raises ``ValueError``, which the registry
treats as could-not-decode — the same contract as any adapter.

Spec references (all public): ITU-T T.81 §B (interchange syntax),
§F.1.2/§F.2.2 (Huffman entropy coding), §A.3.3 (FDCT/IDCT), JFIF 1.02
(YCbCr <-> RGB matrix). The Huffman tables are NOT the Annex K
defaults: the encoder builds uniform-length canonical tables from the
symbols it actually emits and declares them in DHT — so the decoder is
exercised on its general declared-table path, and nothing here is a
transcription of the spec's example tables.
"""

from __future__ import annotations

import struct

import numpy as np


def _zigzag() -> np.ndarray:
    """Zigzag-scan order: raster index for each of the 64 scan slots."""
    out = []
    for s in range(15):
        rs = list(range(max(0, s - 7), min(s, 7) + 1))
        if s % 2 == 0:
            rs.reverse()
        out.extend(r * 8 + (s - r) for r in rs)
    return np.array(out, dtype=np.int64)


_ZZ = _zigzag()

# orthonormal 8-point DCT-II matrix: S = C @ (b - 128) @ C.T, b = C.T @ S @ C + 128
_C = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5) * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _mag(v: int) -> tuple[int, int]:
    """(size category, extra bits) of a DC diff / AC coefficient."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _unmag(s: int, bits: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # §B.1.1.5 byte stuffing
                self.buf.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.acc = 0
            self.n = 0


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.i = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.i >= len(self.d):
                raise ValueError("JPEG entropy stream truncated")
            b = self.d[self.i]
            self.i += 1
            if b == 0xFF:
                if self.i >= len(self.d) or self.d[self.i] != 0x00:
                    raise ValueError("unexpected marker inside entropy stream")
                self.i += 1  # drop the stuffed 0x00
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def symbol(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid Huffman code")


def _canonical_decode_table(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol for a DHT-declared canonical table."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _uniform_encode_table(symbols) -> tuple[list[int], list[int], dict]:
    """Canonical table with every used symbol at one code length L
    (smallest L with n_syms <= 2^L - 1, so the forbidden all-ones code
    is never assigned): (bits, vals, symbol -> (code, L))."""
    syms = sorted(set(symbols))
    k = len(syms)
    L = max(1, k.bit_length())
    bits = [0] * 16
    bits[L - 1] = k
    enc = {s: (i, L) for i, s in enumerate(syms)}
    return bits, syms, enc


def _rgb_to_ycbcr(img: np.ndarray) -> list[np.ndarray]:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return [y, cb, cr]


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _pad_to(plane: np.ndarray, rows: int, cols: int) -> np.ndarray:
    return np.pad(
        plane, ((0, rows - plane.shape[0]), (0, cols - plane.shape[1])), mode="edge"
    )


def _quantize_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(n_by, n_bx, 64) zigzag-ordered quantized coefficients."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    coef = np.einsum("ux,ijxy,vy->ijuv", _C, blocks, _C)
    q = np.round(coef / qt).astype(np.int64)
    return q.reshape(by, bx, 64)[..., _ZZ]


def encode_baseline_jpeg(
    img: np.ndarray, q: int = 2, subsampling: str = "444"
) -> bytes:
    """Encode a (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline sequential JPEG (one interleaved scan, declared uniform
    Huffman tables, flat quantization step ``q`` — q=1 is near-lossless
    up to DCT rounding)."""
    img = np.asarray(img)
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    elif img.ndim == 3 and img.shape[2] == 3:
        planes = _rgb_to_ycbcr(img)
        if subsampling == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
            for c in (1, 2):
                p = planes[c]
                ph = (p.shape[0] + 1) // 2 * 2
                pw = (p.shape[1] + 1) // 2 * 2
                p = _pad_to(p, ph, pw)
                planes[c] = (
                    p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
                )
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
    else:
        raise ValueError("image must be (h, w) gray or (h, w, 3) RGB")

    h, w = img.shape[:2]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qt = np.full((8, 8), float(q))
    coefs = []
    for (hi, vi), plane in zip(samp, planes):
        coefs.append(
            _quantize_blocks(_pad_to(plane, mcuy * 8 * vi, mcux * 8 * hi), qt)
        )

    # pass 1: walk the MCU stream once to collect each table's symbols
    n_comp = len(planes)
    dc_syms: list[list[int]] = [[], []]
    ac_syms: list[list[int]] = [[], []]
    pred = [0] * n_comp
    stream = []  # (tclass, dc_sym, dc_extra, [(ac_sym, extra, nbits)...])
    for my in range(mcuy):
        for mx in range(mcux):
            for c in range(n_comp):
                hi, vi = samp[c]
                tcl = 0 if c == 0 else 1
                for by in range(vi):
                    for bx in range(hi):
                        zz = coefs[c][my * vi + by, mx * hi + bx]
                        diff = int(zz[0]) - pred[c]
                        pred[c] = int(zz[0])
                        s, extra = _mag(diff)
                        dc_syms[tcl].append(s)
                        acs = []
                        nz = np.flatnonzero(zz[1:])
                        last = int(nz[-1]) + 1 if nz.size else 0
                        run = 0
                        for i in range(1, last + 1):
                            v = int(zz[i])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                acs.append((0xF0, 0, 0))
                                ac_syms[tcl].append(0xF0)
                                run -= 16
                            sz, eb = _mag(v)
                            acs.append(((run << 4) | sz, eb, sz))
                            ac_syms[tcl].append((run << 4) | sz)
                            run = 0
                        if last < 63:
                            acs.append((0x00, 0, 0))
                            ac_syms[tcl].append(0x00)
                        stream.append((tcl, s, extra, acs))

    n_tables = 1 if n_comp == 1 else 2
    dc_tabs = [_uniform_encode_table(dc_syms[t]) for t in range(n_tables)]
    ac_tabs = [_uniform_encode_table(ac_syms[t]) for t in range(n_tables)]

    # pass 2: entropy-encode
    bw = _BitWriter()
    for tcl, s, extra, acs in stream:
        code, length = dc_tabs[tcl][2][s]
        bw.write(code, length)
        bw.write(extra, s)
        for sym, eb, sz in acs:
            code, length = ac_tabs[tcl][2][sym]
            bw.write(code, length)
            bw.write(eb, sz)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    dqt = bytes([0]) + bytes(int(qt.reshape(64)[z]) for z in _ZZ)
    out += seg(0xFFDB, dqt)
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for c in range(n_comp):
        hi, vi = samp[c]
        sof += bytes([c + 1, (hi << 4) | vi, 0])
    out += seg(0xFFC0, sof)
    for t in range(n_tables):
        bits, vals, _ = dc_tabs[t]
        out += seg(0xFFC4, bytes([0x00 | t]) + bytes(bits) + bytes(vals))
        bits, vals, _ = ac_tabs[t]
        out += seg(0xFFC4, bytes([0x10 | t]) + bytes(bits) + bytes(vals))
    sos = bytes([n_comp])
    for c in range(n_comp):
        t = 0 if c == 0 else 1
        sos += bytes([c + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_baseline_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG to uint8 gray (h, w) or RGB
    (h, w, 3). Raises ValueError on anything outside the supported
    envelope (progressive, 12-bit, arithmetic coding, restart
    intervals, >2x2 sampling) — could-not-decode for the adapter seam."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    sof = None
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("bad JPEG segment marker")
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("JPEG without scan data")
        (size,) = struct.unpack_from(">H", payload, i + 2)
        body = payload[i + 4 : i + 2 + size]
        i += 2 + size
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.zeros(64)
                tab[_ZZ] = np.frombuffer(body[j + 1 : j + 65], dtype=np.uint8)
                qts[tq] = tab.reshape(8, 8).astype(np.float64)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                n = sum(bits)
                vals = list(body[j + 17 : j + 17 + n])
                huff[(tc, th)] = _canonical_decode_table(bits, vals)
                j += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, n_comp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(n_comp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic)")
        elif marker == 0xDD:  # DRI
            if struct.unpack(">H", body)[0] != 0:
                raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("SOS before SOF")
            n_scan = body[0]
            scan_tabs = {}
            for c in range(n_scan):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan_tabs[cid] = (tt >> 4, tt & 0x0F)
            return _decode_scan(payload, i, sof, scan_tabs, qts, huff)
        # APPn / COM / other: skipped
    raise ValueError("JPEG missing SOS")


def _decode_scan(payload, pos, sof, scan_tabs, qts, huff) -> np.ndarray:
    h, w, comps = sof
    if len(comps) not in (1, 3):
        raise ValueError("only 1- or 3-component JPEG supported")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors above 2x2 unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    rd = _BitReader(payload, pos)
    planes = {}
    for cid, hi, vi, _tq in comps:
        planes[cid] = np.zeros((mcuy * vi, mcux * hi, 64))
    pred = {cid: 0 for cid, *_ in comps}
    for my in range(mcuy):
        for mx in range(mcux):
            for cid, hi, vi, _tq in comps:
                td, ta = scan_tabs[cid]
                dct = huff.get((0, td))
                act = huff.get((1, ta))
                if dct is None or act is None:
                    raise ValueError("scan references undeclared Huffman table")
                for by in range(vi):
                    for bx in range(hi):
                        zz = np.zeros(64, dtype=np.int64)
                        s = rd.symbol(dct)
                        pred[cid] += _unmag(s, rd.bits(s)) if s else 0
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            sym = rd.symbol(act)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _unmag(size, rd.bits(size))
                            k += 1
                        planes[cid][my * vi + by, mx * hi + bx] = zz
    out_planes = []
    for cid, hi, vi, tq in comps:
        if tq not in qts:
            raise ValueError("component references undeclared quant table")
        zz = planes[cid]
        coef = np.zeros_like(zz)
        coef[..., _ZZ] = zz * qts[tq].reshape(64)[_ZZ]
        nby, nbx = coef.shape[:2]
        blocks = np.einsum(
            "xu,ijuv,yv->ijxy", _C.T, coef.reshape(nby, nbx, 8, 8), _C.T
        ) + 128.0
        plane = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        ch = -(-h * vi // vmax)
        cw = -(-w * hi // hmax)
        plane = plane[:ch, :cw]
        # nearest-neighbor chroma upsample back to full resolution
        plane = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        return np.clip(out_planes[0].round(), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(*out_planes)

"""TEST-ONLY FLAC subset codec (RFC 9639 / xiph FLAC format, public
spec): a minimal pure-Python/numpy decoder plus a matching
single-purpose encoder used to manufacture REAL FLAC payloads inside
the test suite.

Exists to prove the engine's external-codec adapter seam
(operators/multimodal.register_decoder) end-to-end against a genuine
AUDIO codec: r12 proved the seam with a vendored JPEG decoder
(tests/jpegref.py); this is the audio-side counterpart, since the
container ships no soundfile/libFLAC. It is NOT part of the engine —
production deployments register soundfile via
``register_default_adapters()``; this module lives in ``tests/`` and
supports only the common subset the encoder emits plus the natural
spec generalizations (16-bit mono, fixed-blocksize streams, CONSTANT /
VERBATIM / FIXED-predictor subframes with Rice-coded residual
partitions of any order, both 4-bit Rice parameter escapes). LPC
subframes, stereo decorrelation and other bit depths raise
``ValueError``, which the registry treats as could-not-decode — the
same contract as any adapter.

Spec references (all public): RFC 9639 §9 (frame/subframe layout),
§9.2.5 (UTF-8-style coded number), §9.2.7 (CRC-8, poly x^8+x^2+x+1),
§9.3 (CRC-16, poly x^16+x^15+x^2+1), §9.4.3 (fixed predictors),
§9.4.5 (Rice residual: zigzag fold, unary quotient = leading 0s then
a 1, partitioned by order). Nothing here is a transcription of
libFLAC: the bit I/O, predictor and Rice machinery are written from
the format description.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# fixed-predictor coefficients by order (RFC 9639 §9.4.3): prediction
# for order k is the k-term alternating binomial over the k previous
# samples
_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            )
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if length:
            self.acc = (self.acc << length) | (value & ((1 << length) - 1))
            self.n += length
            while self.n >= 8:
                self.n -= 8
                self.buf.append((self.acc >> self.n) & 0xFF)

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then the terminating 1

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bit = pos * 8

    def read(self, length: int) -> int:
        out = 0
        for _ in range(length):
            byte = self.bit >> 3
            if byte >= len(self.data):
                raise ValueError("flacref: truncated stream")
            out = (out << 1) | ((self.data[byte] >> (7 - (self.bit & 7))) & 1)
            self.bit += 1
        return out

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("flacref: runaway unary")
        return q

    def align(self) -> None:
        self.bit = (self.bit + 7) & ~7

    def byte_pos(self) -> int:
        return self.bit >> 3


def _write_coded_number(w: _BitWriter, n: int) -> None:
    """RFC 9639 §9.2.5: UTF-8-style variable-length frame number."""
    if n < 0x80:
        w.write(n, 8)
        return
    payload = []
    while True:
        payload.append(n & 0x3F)
        n >>= 6
        k = len(payload)
        # k continuation bytes + lead byte holding (6 - k) value bits
        if n < (1 << (6 - k)):
            break
    lead = (0xFF << (7 - len(payload))) & 0xFF | n
    w.write(lead, 8)
    for part in reversed(payload):
        w.write(0x80 | part, 8)


def _read_coded_number(r: _BitReader) -> int:
    lead = r.read(8)
    if lead < 0x80:
        return lead
    n_cont = 0
    mask = 0x40
    while lead & mask:
        n_cont += 1
        mask >>= 1
    if n_cont == 0 or n_cont > 6:
        raise ValueError("flacref: bad coded number")
    value = lead & (mask - 1)
    for _ in range(n_cont):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("flacref: bad coded-number continuation")
        value = (value << 6) | (b & 0x3F)
    return value


def _fixed_residual(block: np.ndarray, order: int) -> np.ndarray:
    res = block.astype(np.int64)
    for _ in range(order):
        res = np.diff(res)
    return res


def _best_rice_param(res: np.ndarray) -> int:
    folded = np.where(res >= 0, res.astype(np.int64) * 2, -2 * res - 1)
    best_p, best_bits = 0, None
    for p in range(15):
        bits = int(np.sum(folded >> p)) + len(folded) * (p + 1)
        if best_bits is None or bits < best_bits:
            best_p, best_bits = p, bits
    return best_p


def encode_flac(samples: np.ndarray, sample_rate: int, blocksize: int = 1024) -> bytes:
    """int16 mono samples -> a spec-conformant fixed-blocksize FLAC
    stream: STREAMINFO (with the spec's MD5 of the unencoded samples)
    + one frame per block using the best FIXED predictor (order 0-2)
    with a single Rice partition, CONSTANT where the block allows."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim != 1 or len(samples) == 0:
        raise ValueError("encode_flac: need non-empty mono int16 samples")
    if not 0 < sample_rate < (1 << 20):
        raise ValueError("encode_flac: sample rate out of STREAMINFO range")

    si = _BitWriter()
    si.write(blocksize, 16)  # min blocksize
    si.write(blocksize, 16)  # max blocksize
    si.write(0, 24)  # min framesize unknown
    si.write(0, 24)  # max framesize unknown
    si.write(sample_rate, 20)
    si.write(0, 3)  # channels - 1
    si.write(15, 5)  # bps - 1
    si.write(len(samples), 36)
    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + (34).to_bytes(3, "big")  # last block, STREAMINFO
    si.align()
    out += si.bytes() + md5

    for frame_ix, start in enumerate(range(0, len(samples), blocksize)):
        block = samples[start : start + blocksize].astype(np.int64)
        w = _BitWriter()
        w.write(0b11111111111110, 14)  # sync
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocksize strategy
        w.write(0b0111, 4)  # blocksize: 16-bit value at header end
        w.write(0b0000, 4)  # sample rate: from STREAMINFO
        w.write(0, 4)  # channel assignment: mono
        w.write(0b100, 3)  # sample size: 16 bit
        w.write(0, 1)  # reserved
        _write_coded_number(w, frame_ix)
        w.write(len(block) - 1, 16)
        w.align()
        header = w.bytes()
        w = _BitWriter()
        for b in header:
            w.write(b, 8)
        w.write(_crc8(header), 8)

        if np.all(block == block[0]):
            w.write(0, 1)  # subframe padding bit
            w.write(0, 6)  # CONSTANT
            w.write(0, 1)  # no wasted bits
            w.write(int(block[0]), 16)
        else:
            order = min(
                range(3),
                key=lambda o: int(np.abs(_fixed_residual(block, o)).sum())
                if len(block) > o
                else 1 << 62,
            )
            res = _fixed_residual(block, order)
            w.write(0, 1)
            w.write(0b001000 | order, 6)  # FIXED, this order
            w.write(0, 1)
            for warm in block[:order]:
                w.write(int(warm), 16)
            w.write(0b00, 2)  # residual method: 4-bit Rice
            w.write(0, 4)  # partition order 0: one partition
            p = _best_rice_param(res)
            w.write(p, 4)
            for v in res:
                folded = int(v) * 2 if v >= 0 else -2 * int(v) - 1
                w.unary(folded >> p)
                w.write(folded, p)
        w.align()
        frame = w.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def decode_flac(payload: bytes) -> tuple[int, np.ndarray]:
    """FLAC stream -> (sample_rate, int16 mono samples). Subset decoder:
    mono 16-bit fixed-blocksize streams; CONSTANT / VERBATIM / FIXED
    subframes, Rice partitions of any order, both Rice escapes. CRC-8,
    CRC-16 and the STREAMINFO sample-count/MD5 are all verified —
    anything malformed raises (the registry's could-not-decode path)."""
    if payload[:4] != b"fLaC":
        raise ValueError("flacref: not a FLAC stream")
    pos, n = 4, len(payload)
    sr = total = None
    md5_want = None
    while pos + 4 <= n:
        last = payload[pos] & 0x80
        btype = payload[pos] & 0x7F
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if len(body) < size:
            raise ValueError("flacref: truncated metadata")
        if btype == 0:
            if size < 34:
                raise ValueError("flacref: short STREAMINFO")
            b = body[10:18]
            sr = (b[0] << 12) | (b[1] << 4) | (b[2] >> 4)
            ch = ((b[2] >> 1) & 0x07) + 1
            bps = (((b[2] & 1) << 4) | (b[3] >> 4)) + 1
            total = ((b[3] & 0x0F) << 32) | int.from_bytes(b[4:8], "big")
            md5_want = body[18:34]
            if ch != 1 or bps != 16:
                raise ValueError("flacref: only mono 16-bit supported")
        pos += 4 + size
        if last:
            break
    if sr is None or not sr:
        raise ValueError("flacref: missing/invalid STREAMINFO")

    out: list[np.ndarray] = []
    got = 0
    while got < (total or 0) and pos < n:
        r = _BitReader(payload, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError("flacref: lost frame sync")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy (frame/sample number — same parse)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)
        if ch_code != 0:
            raise ValueError("flacref: only mono supported")
        if ss_code not in (0b100, 0b000):  # 16-bit or from STREAMINFO
            raise ValueError("flacref: only 16-bit supported")
        _read_coded_number(r)
        if bs_code == 0b0110:
            blocksize = r.read(8) + 1
        elif bs_code == 0b0111:
            blocksize = r.read(16) + 1
        elif bs_code in _BLOCKSIZE_TABLE:
            blocksize = _BLOCKSIZE_TABLE[bs_code]
        else:
            raise ValueError("flacref: reserved blocksize code")
        if sr_code == 0b1100:
            r.read(8)
        elif sr_code in (0b1101, 0b1110):
            r.read(16)
        elif sr_code == 0b1111:
            raise ValueError("flacref: invalid sample-rate code")
        header_len = r.byte_pos() - pos
        if _crc8(payload[pos : pos + header_len]) != r.read(8):
            raise ValueError("flacref: frame header CRC-8 mismatch")

        pad = r.read(1)
        stype = r.read(6)
        if pad:
            raise ValueError("flacref: subframe padding bit set")
        if r.read(1):
            raise ValueError("flacref: wasted bits unsupported")
        if stype == 0:  # CONSTANT
            v = r.read(16)
            v -= 1 << 16 if v & 0x8000 else 0
            block = np.full(blocksize, v, dtype=np.int64)
        elif stype == 1:  # VERBATIM
            vals = [r.read(16) for _ in range(blocksize)]
            block = np.array(
                [v - (1 << 16) if v & 0x8000 else v for v in vals], dtype=np.int64
            )
        elif 8 <= stype <= 12:  # FIXED, order 0-4
            order = stype - 8
            warm = []
            for _ in range(order):
                v = r.read(16)
                warm.append(v - (1 << 16) if v & 0x8000 else v)
            method = r.read(2)
            if method not in (0, 1):
                raise ValueError("flacref: reserved residual method")
            pbits = 4 if method == 0 else 5
            escape = (1 << pbits) - 1
            porder = r.read(4)
            nparts = 1 << porder
            if blocksize % nparts or (blocksize >> porder) <= order and porder:
                raise ValueError("flacref: bad partition order")
            res: list[int] = []
            for part in range(nparts):
                count = (blocksize >> porder) - (order if part == 0 else 0)
                p = r.read(pbits)
                if p == escape:
                    raw = r.read(5)
                    vals = [r.read(raw) for _ in range(count)]
                    res.extend(
                        v - (1 << raw) if raw and v & (1 << (raw - 1)) else v
                        for v in vals
                    )
                else:
                    for _ in range(count):
                        folded = (r.unary() << p) | r.read(p)
                        res.append(
                            folded >> 1 if folded % 2 == 0 else -((folded + 1) >> 1)
                        )
            block = np.empty(blocksize, dtype=np.int64)
            block[:order] = warm
            coef = _FIXED_COEF[order]
            for i in range(order, blocksize):
                pred = sum(c * block[i - 1 - j] for j, c in enumerate(coef))
                block[i] = pred + res[i - order]
        else:
            raise ValueError(f"flacref: unsupported subframe type {stype}")

        r.align()
        frame_len = r.byte_pos() - pos
        want = struct.unpack_from(">H", payload, pos + frame_len)[0]
        if _crc16(payload[pos : pos + frame_len]) != want:
            raise ValueError("flacref: frame CRC-16 mismatch")
        pos += frame_len + 2
        out.append(block)
        got += len(block)

    samples = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
    if total and len(samples) != total:
        raise ValueError("flacref: sample count mismatch vs STREAMINFO")
    samples = samples[: total or len(samples)]
    if np.any(samples > 32767) or np.any(samples < -32768):
        raise ValueError("flacref: decoded sample out of int16 range")
    samples16 = samples.astype(np.int16)
    if md5_want and md5_want != b"\x00" * 16:
        if hashlib.md5(samples16.astype("<i2").tobytes()).digest() != md5_want:
            raise ValueError("flacref: decoded MD5 mismatch")
    return sr, samples16

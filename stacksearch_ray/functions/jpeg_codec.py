"""Baseline JPEG (JFIF) encoder/decoder in pure NumPy + stdlib — the
last media format that was honestly stubbed (no codec libraries in
this environment). Everything here is from the PUBLIC ITU-T T.81 spec:
Annex K quantization/Huffman tables, canonical Huffman code
construction (C.2), the F.1.2 DC-difference/AC run-length entropy
model, and the JFIF/BT.601 color transform.

Scope (documented, enforced): baseline DCT, 8-bit, single scan,
4:4:4 or 4:2:0 sampling (the real-world default), no restart
intervals — exactly what ``encode_jpeg`` emits, plus any third-party
stream within that envelope. Progressive (SOF2) and other sampling
layouts raise with a clear message.

The DCT uses the orthonormal matrix form (T A Tᵀ with T[0]=1/√8,
T[u,x]=½cos((2x+1)uπ/16)) which equals the spec's ¼C(u)C(v)Σ form.
Round-trip quality is pinned by pytest (PSNR, flat-block exactness).
"""

from __future__ import annotations

import struct

import numpy as np

# ---- public Annex K tables ----

# K.1 luminance / K.2 chrominance quantization (quality 50 base)
QY = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int32).reshape(8, 8)
QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int32).reshape(8, 8)

_Z = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int64)

# K.3 standard Huffman tables: (BITS[1..16], HUFFVAL)
DC_L = ((0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
        tuple(range(12)))
DC_C = ((0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
        tuple(range(12)))
AC_L = ((0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D), (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA))
AC_C = ((0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77), (
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA))


def _dct_matrix() -> np.ndarray:
    t = np.zeros((8, 8))
    t[0, :] = 1.0 / np.sqrt(8.0)
    for u in range(1, 8):
        t[u, :] = 0.5 * np.cos((2 * np.arange(8) + 1) * u * np.pi / 16)
    return t


_T = _dct_matrix()


def _canonical_codes(bits, vals):
    """Spec C.2: canonical Huffman (code, length) per symbol."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill final byte
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, magnitude bits) — F.1.2.1/F.1.2.2."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _blocks(channel: np.ndarray) -> np.ndarray:
    """(H, W) → (n_blocks_y, n_blocks_x, 8, 8), edge-replicated pad."""
    h, w = channel.shape
    ph, pw = -h % 8, -w % 8
    c = np.pad(channel, ((0, ph), (0, pw)), mode="edge")
    H, W = c.shape
    return c.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1) + 0.5,
                   0, 255).astype(np.uint8)


def _write_block(bw, zz, dc_codes, ac_codes, prev_dc, ci) -> None:
    """Entropy-encode ONE zigzagged quantized block (F.1.2)."""
    diff = int(zz[0]) - prev_dc[ci]
    prev_dc[ci] = int(zz[0])
    size, bits = _magnitude(diff)
    code, length = dc_codes[ci][size]
    bw.write(code, length)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c0, l0 = ac_codes[ci][0xF0]  # ZRL
            bw.write(c0, l0)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[ci][(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        c0, l0 = ac_codes[ci][0x00]  # EOB
        bw.write(c0, l0)


def _pad_to(plane: np.ndarray, H: int, W: int) -> np.ndarray:
    return np.pad(plane, ((0, H - plane.shape[0]),
                          (0, W - plane.shape[1])), mode="edge")


def encode_jpeg(rgb: np.ndarray, quality: int = 75,
                subsampling: str = "444") -> bytes:
    """(H, W, 3) uint8 → baseline JFIF bytes. ``subsampling``:
    "444" (one block per component per MCU) or "420" (the real-world
    default — chroma 2×2 box-downsampled, MCU = 4 Y + Cb + Cr).
    Standard Huffman tables, IJG quality scaling of the Annex-K quant
    tables."""
    rgb = np.asarray(rgb)
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_jpeg needs (H, W, 3) uint8")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = rgb.shape[:2]
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qy = np.clip((QY * scale + 50) // 100, 1, 255).astype(np.int32)
    qc = np.clip((QC * scale + 50) // 100, 1, 255).astype(np.int32)

    ycc = rgb_to_ycbcr(rgb)
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    if subsampling == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
        he, we = h + (h % 2), w + (w % 2)
        cbp, crp = _pad_to(cb, he, we), _pad_to(cr, he, we)
        cb = (cbp[0::2, 0::2] + cbp[1::2, 0::2]
              + cbp[0::2, 1::2] + cbp[1::2, 1::2]) / 4.0
        cr = (crp[0::2, 0::2] + crp[1::2, 0::2]
              + crp[0::2, 1::2] + crp[1::2, 1::2]) / 4.0
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
    hmax = max(si[0] for si in samp)
    vmax = max(si[1] for si in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    coeffs = []
    for (plane, qt), (hi, vi) in zip(
            ((y, qy), (cb, qc), (cr, qc)), samp):
        blocks = _blocks(_pad_to(plane, mcuy * 8 * vi, mcux * 8 * hi))
        by, bx = blocks.shape[:2]
        flat = blocks.reshape(-1, 8, 8) - 128.0
        dct = np.einsum("ux,nxy,vy->nuv", _T, flat, _T)
        quant = np.round(dct / qt[None, :, :]).astype(np.int32)
        coeffs.append(quant.reshape(by, bx, 8, 8))

    dc_codes = [_canonical_codes(*DC_L), _canonical_codes(*DC_C),
                _canonical_codes(*DC_C)]
    ac_codes = [_canonical_codes(*AC_L), _canonical_codes(*AC_C),
                _canonical_codes(*AC_C)]
    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hi, vi) in enumerate(samp):
                for byi in range(vi):
                    for bxi in range(hi):
                        blk = coeffs[ci][my * vi + byi, mx * hi + bxi]
                        _write_block(bw, blk.reshape(64)[_Z],
                                     dc_codes, ac_codes, prev_dc, ci)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qy.reshape(64)[_Z].astype(np.uint8)))
    out += seg(0xFFDB, b"\x01" + bytes(qc.reshape(64)[_Z].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, (hi, vi), tq in ((1, samp[0], 0), (2, samp[1], 1),
                              (3, samp[2], 1)):
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += seg(0xFFC0, sof)
    for cls_dest, (bits, vals) in ((0x00, DC_L), (0x10, AC_L),
                                   (0x01, DC_C), (0x11, AC_C)):
        out += seg(0xFFC4, bytes([cls_dest]) + bytes(bits)
                   + bytes(vals))
    out += seg(0xFFDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg scan truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) \
                    else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("unexpected marker inside scan")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_tree(bits, vals):
    """length → {code: symbol} maps for canonical decode."""
    by_len: dict[int, dict[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        if bits[length - 1]:
            by_len[length] = {}
            for _ in range(bits[length - 1]):
                by_len[length][code] = vals[k]
                code += 1
                k += 1
        code <<= 1
    return by_len


def _read_symbol(br: _BitReader, tree) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        hit = tree.get(length)
        if hit is not None and code in hit:
            return hit[code]
    raise ValueError("bad huffman code in jpeg scan")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (H, W, 3) uint8 RGB. Supports the
    ``encode_jpeg`` envelope: baseline sequential (SOF0), 8-bit, 3
    components at 4:4:4 or 4:2:0, single scan, no restarts."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a jpeg (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    h = w = None
    comp_q: list[int] = []
    comp_samp: list[tuple[int, int]] = []
    scan_comps: list[tuple[int, int]] = []
    scan_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker in (0xC2, 0xC1, 0xC3):
            raise NotImplementedError(
                "only baseline sequential (SOF0) jpeg is supported")
        ln = struct.unpack(">H", data[pos:pos + 2])[0]
        payload = data[pos + 2:pos + ln]
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                z = np.frombuffer(payload[p + 1:p + 65], np.uint8)
                t = np.zeros(64, np.int32)
                t[_Z] = z
                qt[tq] = t.reshape(8, 8)
                p += 65
        elif marker == 0xC0:
            _prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if nc != 3:
                raise NotImplementedError("only 3-component jpeg")
            for ci in range(nc):
                cid, sampb, tq = payload[6 + 3 * ci:9 + 3 * ci]
                comp_samp.append((sampb >> 4, sampb & 0xF))
                comp_q.append(tq)
            if comp_samp not in ([(1, 1)] * 3,
                                 [(2, 2), (1, 1), (1, 1)]):
                raise NotImplementedError(
                    "only 4:4:4 or 4:2:0 sampling is supported")
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                cls, dest = payload[p] >> 4, payload[p] & 0xF
                bits = tuple(payload[p + 1:p + 17])
                n = sum(bits)
                vals = tuple(payload[p + 17:p + 17 + n])
                huff[(cls, dest)] = _decode_tree(bits, vals)
                p += 17 + n
        elif marker == 0xDA:
            ns = payload[0]
            for ci in range(ns):
                _cid, tda = payload[1 + 2 * ci:3 + 2 * ci]
                scan_comps.append((tda >> 4, tda & 0xF))
            scan_start = pos + ln
            break
        pos += ln
    if scan_start is None or h is None:
        raise ValueError("jpeg missing SOF/SOS")
    # scan ends at EOI (or any unstuffed marker)
    br = _BitReader(data[scan_start:])
    hmax = max(si[0] for si in comp_samp)
    vmax = max(si[1] for si in comp_samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [np.zeros((mcuy * 8 * vi, mcux * 8 * hi))
              for hi, vi in comp_samp]
    prev_dc = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hi, vi) in enumerate(comp_samp):
                td, ta = scan_comps[ci]
                for byi in range(vi):
                    for bxi in range(hi):
                        s = _read_symbol(br, huff[(0, td)])
                        diff = _extend(br.read_bits(s), s) if s else 0
                        prev_dc[ci] += diff
                        zz = np.zeros(64, np.int32)
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(br, huff[(1, ta)])
                            r, s = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        blk = np.zeros(64, np.float64)
                        blk[_Z] = zz * qt[comp_q[ci]].reshape(64)[_Z]
                        pix = _T.T @ blk.reshape(8, 8) @ _T + 128.0
                        y0 = (my * vi + byi) * 8
                        x0 = (mx * hi + bxi) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
    full = []
    for (hi, vi), plane in zip(comp_samp, planes):
        up = np.repeat(np.repeat(plane, vmax // vi, axis=0),
                       hmax // hi, axis=1)
        full.append(up[:h, :w])
    return ycbcr_to_rgb(np.stack(full, axis=-1))

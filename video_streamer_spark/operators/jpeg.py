"""Baseline JPEG (ITU T.81 sequential DCT) decode/encode in pure
numpy + stdlib — the second genuinely COMPRESSED codec through the O2
decode path (reference `decodebin`, run.sh:53), after PNG.

Scope (honest): baseline sequential, 8-bit, Huffman entropy coding,
grayscale and YCbCr with ARBITRARY sampling factors (4:4:4, 4:2:0,
4:2:2, ... — full MCU interleave per T.81 A.2.3 with nearest-neighbor
chroma upsample), and DRI/RSTn restart intervals (predictor reset +
byte realign). Progressive and arithmetic coding raise
NotImplementedError — format variants, not different math; a
production deployment swaps a codec lib into the same dispatcher slot.

The full pipeline is real: marker parse (DQT/SOF0/DHT/SOS), bitstream
Huffman decode with 0xFF00 byte-unstuffing, DC prediction, zigzag
de-serialization, dequantization, 2-D IDCT as two 8×8 basis-matrix
multiplies, level shift + clamp, YCbCr→RGB (BT.601, JFIF).

Exactness property the oracle leans on (x104): with unit quantization
tables, a FLAT 8×8 block is DC-only; its DCT, quantization, and IDCT
are all integer-exact, so encode→decode reproduces the block byte for
byte and a SQL oracle can recompute decoded-pixel statistics from the
source text. Non-flat content round-trips within the quantization
error bound instead (property-tested).
"""

from __future__ import annotations

import numpy as np

# zigzag order: index i of the scan -> (row, col) in the 8x8 block
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# standard Huffman tables (T.81 Annex K.3): (bits[1..16], values)
_STD_DC_LUM = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUM = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II basis: A[k, n] = c(k)/2 * cos((2n+1)kπ/16)
_A = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _c = np.sqrt(0.5) if _k == 0 else 1.0
        _A[_k, _n] = 0.5 * _c * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def _dct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


def _build_huffman_decoder(bits: list[int], values: list[int]) -> dict:
    """(code_length, code) -> value map built per T.81 C.2."""
    table = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = values[idx]
            idx += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; raises at markers/EOF."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huffman(self, table: dict) -> int:
        length, code = 0, 0
        while length <= 16:
            code = (code << 1) | self.read_bit()
            length += 1
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid Huffman code in scan")

    def skip_restart(self) -> None:
        """Consume an RSTn marker: discard the pad bits to the byte
        boundary, then the 0xFFD0-D7 pair (T.81 F.2.1.3.1)."""
        self.bitbuf = 0
        self.nbits = 0
        while self.data[self.pos] == 0xFF and self.data[self.pos + 1] == 0xFF:
            self.pos += 1  # optional fill bytes before the marker
        m0, m1 = self.data[self.pos], self.data[self.pos + 1]
        if m0 != 0xFF or not (0xD0 <= m1 <= 0xD7):
            raise ValueError(
                f"expected restart marker, found 0x{m0:02X}{m1:02X}"
            )
        self.pos += 2


def _extend(value: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a SIZE-bit magnitude."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to an (h, w, 3) uint8 tensor (grayscale
    broadcast to 3 channels — same contract as the PPM/BMP/PNG
    decoders)."""
    buf = bytes(payload)
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    dri = 0
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decoder map
    frame = None
    scan_comps = None
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seg_len = int.from_bytes(buf[pos : pos + 2], "big")
        seg = buf[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables")
                q = np.zeros(64, dtype=np.int32)
                q[_ZIGZAG] = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int32)
                qt[tid] = q.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tclass, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = [0] + list(seg[p + 1 : p + 17])
                n = sum(bits)
                values = list(seg[p + 17 : p + 17 + n])
                huff[(tclass, tid)] = _build_huffman_decoder(bits, values)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                hs, vs = samp >> 4, samp & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(f"bad sampling factors {hs}x{vs}")
                comps.append({"id": cid, "tq": tq, "hs": hs, "vs": vs})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI: restart interval in MCUs
            dri = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append(
                    {"id": cs, "dc": tables >> 4, "ac": tables & 0x0F}
                )
            pos += seg_len
            break  # entropy-coded data follows
        pos += seg_len
    if frame is None or scan_comps is None:
        raise ValueError("JPEG missing SOF0/SOS")

    h, w = frame["h"], frame["w"]
    # MCU geometry (T.81 A.2.3): hmax×vmax 8-pixel blocks per MCU;
    # component i contributes hs_i×vs_i blocks per MCU into a plane
    # subsampled by (hmax/hs_i, vmax/vs_i)
    hmax = max(c["hs"] for c in frame["comps"])
    vmax = max(c["vs"] for c in frame["comps"])
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    reader = _BitReader(buf, pos)
    comp_by_id = {c["id"]: c for c in frame["comps"]}
    planes = {
        c["id"]: np.zeros(
            (mcus_y * 8 * c["vs"], mcus_x * 8 * c["hs"]), dtype=np.float64
        )
        for c in frame["comps"]
    }
    pred = {c["id"]: 0 for c in frame["comps"]}

    def _read_block(sc: dict) -> np.ndarray:
        dc_tab = huff[(0, sc["dc"])]
        ac_tab = huff[(1, sc["ac"])]
        q = qt[comp_by_id[sc["id"]]["tq"]]
        zz = np.zeros(64, dtype=np.int32)
        size = reader.read_huffman(dc_tab)
        diff = _extend(reader.read_bits(size), size)
        pred[sc["id"]] += diff
        zz[0] = pred[sc["id"]]
        k = 1
        while k < 64:
            rs = reader.read_huffman(ac_tab)
            run, size = rs >> 4, rs & 0x0F
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += run
            if k > 63:
                raise ValueError("AC run past end of block")
            zz[k] = _extend(reader.read_bits(size), size)
            k += 1
        block = np.zeros(64, dtype=np.float64)
        block[_ZIGZAG] = zz
        return _idct2(block.reshape(8, 8) * q) + 128.0

    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                reader.skip_restart()
                for cid in pred:
                    pred[cid] = 0  # predictors reset at every restart
            mcu_count += 1
            for sc in scan_comps:  # data-unit order within the MCU
                comp = comp_by_id[sc["id"]]
                for v in range(comp["vs"]):
                    for hh in range(comp["hs"]):
                        pix = _read_block(sc)
                        y0 = (my * comp["vs"] + v) * 8
                        x0 = (mx * comp["hs"] + hh) * 8
                        planes[sc["id"]][y0 : y0 + 8, x0 : x0 + 8] = pix
    out_planes = []
    for c in frame["comps"]:
        p = planes[c["id"]]
        # nearest-neighbor chroma upsample back to full resolution
        if c["vs"] != vmax or c["hs"] != hmax:
            p = np.repeat(
                np.repeat(p, vmax // c["vs"], axis=0), hmax // c["hs"], axis=1
            )
        out_planes.append(np.clip(np.round(p[:h, :w]), 0, 255))
    if len(out_planes) == 1:
        g = out_planes[0].astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(out_planes) == 3:
        y, cb, cr = out_planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=2)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    raise NotImplementedError(f"{len(out_planes)}-component JPEG")


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc <<= 8 - self.nbits  # pad with 0s per T.81 (1s also legal)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _huffman_encoder(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    dec = _build_huffman_decoder(bits, values)
    return {v: (length, code) for (length, code), v in dec.items()}


def _magnitude(v: int) -> tuple[int, int]:
    """(size, SIZE-bit code) for a DC diff / AC value per T.81 F.1.2."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    code = v if v > 0 else v + (1 << size) - 1
    return size, code


def encode_jpeg_gray(pixels: np.ndarray, quant: int = 1) -> bytes:
    """Encode an 8-bit grayscale image as a REAL baseline JPEG (standard
    Annex-K Huffman tables, flat quant table of ``quant``). With
    quant=1 and blocks of uniform value the round trip is bit-exact
    (DC-only, integer DCT values); general content round-trips within
    the quantization bound."""
    a = np.asarray(pixels, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError("grayscale encoder expects a 2-D array")
    h, w = a.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = a
    padded[h:, :w] = a[-1:, :]  # edge-replicate pad
    padded[:, w:] = padded[:, w - 1 : w]

    q = np.full((8, 8), quant, dtype=np.int32)
    dc_enc = _huffman_encoder(*_STD_DC_LUM)
    ac_enc = _huffman_encoder(*_STD_AC_LUM)
    writer = _BitWriter()
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = np.round(_dct2(block) / q).astype(np.int64)
            # natural -> zigzag: scan position i carries natural index
            # _ZIGZAG[i] (the same convention the decoder inverts)
            zz = coef.reshape(64)[_ZIGZAG]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            size, code = _magnitude(diff)
            length, hcode = dc_enc[size]
            writer.write(hcode, length)
            writer.write(code, size)
            # AC: run-length of zeros + magnitude
            k = 1
            run = 0
            last_nonzero = max(
                [i for i in range(1, 64) if zz[i] != 0], default=0
            )
            while k <= last_nonzero:
                if zz[k] == 0:
                    run += 1
                    k += 1
                    continue
                while run >= 16:
                    length, hcode = ac_enc[0xF0]
                    writer.write(hcode, length)
                    run -= 16
                size, code = _magnitude(int(zz[k]))
                length, hcode = ac_enc[(run << 4) | size]
                writer.write(hcode, length)
                writer.write(code, size)
                run = 0
                k += 1
            if last_nonzero < 63:
                length, hcode = ac_enc[0x00]  # EOB
                writer.write(hcode, length)
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    zig_q = np.zeros(64, dtype=np.uint8)
    zig_q[np.arange(64)] = q.reshape(64)[_ZIGZAG]
    dqt = seg(0xDB, bytes([0x00]) + zig_q.tobytes())
    sof = seg(
        0xC0,
        bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_STD_DC_LUM[0][1:]) + bytes(_STD_DC_LUM[1])
        + bytes([0x10]) + bytes(_STD_AC_LUM[0][1:]) + bytes(_STD_AC_LUM[1]),
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof + dht + sos + bytes(writer.out) + b"\xff\xd9"
    )

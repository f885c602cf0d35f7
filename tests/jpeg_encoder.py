"""Minimal baseline JPEG ENCODER for test roundtrips — built from the
public ITU-T T.81 spec (Annex K typical huffman tables, Annex A DCT/zigzag)
so the decoder in operators/multimodal.py is verified against an
independently-written counterpart, not against itself. Supports greyscale
and YCbCr color at 4:4:4 / 4:2:0. Test-only; never imported by the
package."""
import struct
import numpy as np

ZIGZAG = [
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
C = np.array([[np.cos((2*x+1)*u*np.pi/16) * (np.sqrt(1/8) if u == 0 else np.sqrt(2/8))
               for x in range(8)] for u in range(8)])

# Annex K.3 luminance DC/AC tables (public spec constants)
DC_COUNTS = [0,1,5,1,1,1,1,1,1,0,0,0,0,0,0,0]
DC_SYMS = list(range(12))
AC_COUNTS = [0,2,1,3,3,2,4,3,5,5,4,4,0,0,1,0x7D]
AC_SYMS = [
0x01,0x02,0x03,0x00,0x04,0x11,0x05,0x12,0x21,0x31,0x41,0x06,0x13,0x51,0x61,
0x07,0x22,0x71,0x14,0x32,0x81,0x91,0xA1,0x08,0x23,0x42,0xB1,0xC1,0x15,0x52,
0xD1,0xF0,0x24,0x33,0x62,0x72,0x82,0x09,0x0A,0x16,0x17,0x18,0x19,0x1A,0x25,
0x26,0x27,0x28,0x29,0x2A,0x34,0x35,0x36,0x37,0x38,0x39,0x3A,0x43,0x44,0x45,
0x46,0x47,0x48,0x49,0x4A,0x53,0x54,0x55,0x56,0x57,0x58,0x59,0x5A,0x63,0x64,
0x65,0x66,0x67,0x68,0x69,0x6A,0x73,0x74,0x75,0x76,0x77,0x78,0x79,0x7A,0x83,
0x84,0x85,0x86,0x87,0x88,0x89,0x8A,0x92,0x93,0x94,0x95,0x96,0x97,0x98,0x99,
0x9A,0xA2,0xA3,0xA4,0xA5,0xA6,0xA7,0xA8,0xA9,0xAA,0xB2,0xB3,0xB4,0xB5,0xB6,
0xB7,0xB8,0xB9,0xBA,0xC2,0xC3,0xC4,0xC5,0xC6,0xC7,0xC8,0xC9,0xCA,0xD2,0xD3,
0xD4,0xD5,0xD6,0xD7,0xD8,0xD9,0xDA,0xE1,0xE2,0xE3,0xE4,0xE5,0xE6,0xE7,0xE8,
0xE9,0xEA,0xF1,0xF2,0xF3,0xF4,0xF5,0xF6,0xF7,0xF8,0xF9,0xFA]

def _codes(counts, syms):
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length-1]):
            out[syms[k]] = (length, code)
            code += 1; k += 1
        code <<= 1
    return out

DC_CODES = _codes(DC_COUNTS, DC_SYMS)
AC_CODES = _codes(AC_COUNTS, AC_SYMS)

class BW:
    def __init__(self):
        self.buf = bytearray(); self.acc = 0; self.n = 0
    def put(self, code, length):
        self.acc = (self.acc << length) | code; self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.acc &= (1 << self.n) - 1
    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)

def _mag(v):
    if v == 0:
        return 0, 0
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    if v < 0:
        v = v + (1 << t) - 1
    return t, v

def encode_jpeg_grey(pix, quant=None):
    """pix: (h, w) uint8, h/w multiples of 8. Greyscale baseline JPEG."""
    h, w = pix.shape
    q = np.ones(64, dtype=np.int64) if quant is None else np.asarray(quant)
    bw = BW()
    pred = 0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            blk = pix[by:by+8, bx:bx+8].astype(np.float64) - 128.0
            coef = C @ blk @ C.T
            zz = np.round(coef.reshape(64)[ZIGZAG] / q[ZIGZAG]).astype(np.int64)
            dc = int(zz[0]); diff = dc - pred; pred = dc
            t, v = _mag(diff)
            ln, cd = DC_CODES[t]; bw.put(cd, ln)
            if t: bw.put(v, t)
            run = 0
            last_nz = max([i for i in range(1, 64) if zz[i] != 0], default=0)
            for k in range(1, last_nz + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, cd = AC_CODES[0xF0]; bw.put(cd, ln); run -= 16
                t, v = _mag(int(zz[k]))
                ln, cd = AC_CODES[(run << 4) | t]; bw.put(cd, ln); bw.put(v, t)
                run = 0
            if last_nz < 63:
                ln, cd = AC_CODES[0x00]; bw.put(cd, ln)
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0]) + bytes(int(q[ZIGZAG[i]]) for i in range(64)))
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(DC_COUNTS) + bytes(DC_SYMS)) \
        + seg(0xC4, bytes([0x10]) + bytes(AC_COUNTS) + bytes(AC_SYMS))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.buf) + b"\xff\xd9")


def _blk_stream(bw, blk, q, pred):
    coef = C @ blk @ C.T
    zz = np.round(coef.reshape(64)[ZIGZAG] / q[ZIGZAG]).astype(np.int64)
    dc = int(zz[0]); diff = dc - pred
    t, v = _mag(diff)
    ln, cd = DC_CODES[t]; bw.put(cd, ln)
    if t: bw.put(v, t)
    run = 0
    last_nz = max([i for i in range(1, 64) if zz[i] != 0], default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1; continue
        while run > 15:
            ln, cd = AC_CODES[0xF0]; bw.put(cd, ln); run -= 16
        t, v = _mag(int(zz[k]))
        ln, cd = AC_CODES[(run << 4) | t]; bw.put(cd, ln); bw.put(v, t)
        run = 0
    if last_nz < 63:
        ln, cd = AC_CODES[0x00]; bw.put(cd, ln)
    return dc


def encode_jpeg_color(rgb, subsample=False, quant=None):
    """rgb: (h, w, 3) uint8; h/w multiples of 16. YCbCr baseline JPEG,
    4:2:0 when subsample else 4:4:4 (both Annex K huffman tables, shared
    across components for simplicity)."""
    h, w, _ = rgb.shape
    q = np.ones(64, dtype=np.int64) if quant is None else np.asarray(quant)
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    if subsample:
        cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        hs_vs = [(2, 2), (1, 1), (1, 1)]
        mcuh, mcuw = 16, 16
    else:
        hs_vs = [(1, 1), (1, 1), (1, 1)]
        mcuh, mcuw = 8, 8
    planes = [y, cb, cr]
    bw = BW()
    preds = [0, 0, 0]
    for my in range(0, h // mcuh):
        for mx in range(0, w // mcuw):
            for ci, ((hs, vs), plane) in enumerate(zip(hs_vs, planes)):
                for byi in range(vs):
                    for bxi in range(hs):
                        y0 = (my * vs + byi) * 8
                        x0 = (mx * hs + bxi) * 8
                        blk = plane[y0:y0+8, x0:x0+8] - 128.0
                        preds[ci] = _blk_stream(bw, blk, q, preds[ci])
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0]) + bytes(int(q[ZIGZAG[i]]) for i in range(64)))
    comps = b""
    for cid, (hs, vs) in zip((1, 2, 3), hs_vs):
        comps += bytes([cid, (hs << 4) | vs, 0])
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([3]) + comps)
    dht = seg(0xC4, bytes([0x00]) + bytes(DC_COUNTS) + bytes(DC_SYMS)) \
        + seg(0xC4, bytes([0x10]) + bytes(AC_COUNTS) + bytes(AC_SYMS))
    sos = seg(0xDA, bytes([3]) + b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3))
              + bytes([0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.buf) + b"\xff\xd9")


def encode_jpeg_grey_restarts(pix, restart_interval=2, quant=None):
    """Greyscale baseline JPEG with DRI + restart markers every
    ``restart_interval`` MCUs (DC predictor resets, RSTn modulo-8 cycle) —
    exercises the decoder's resync path."""
    h, w = pix.shape
    q = np.ones(64, dtype=np.int64) if quant is None else np.asarray(quant)
    chunks = []
    bw = BW()
    pred = 0
    mcu = 0
    rst = 0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                chunks.append(bytes(bw.buf) + bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                bw = BW()
                pred = 0
            blk = pix[by:by+8, bx:bx+8].astype(np.float64) - 128.0
            pred = _blk_stream(bw, blk, q, pred)
            mcu += 1
    bw.flush()
    chunks.append(bytes(bw.buf))

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0]) + bytes(int(q[ZIGZAG[i]]) for i in range(64)))
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(DC_COUNTS) + bytes(DC_SYMS)) \
        + seg(0xC4, bytes([0x10]) + bytes(AC_COUNTS) + bytes(AC_SYMS))
    dri = seg(0xDD, struct.pack(">H", restart_interval))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht + dri + sos
            + b"".join(chunks) + b"\xff\xd9")

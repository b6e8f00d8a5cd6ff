"""Minimal baseline JPEG encoder for tests: all-ones quant tables,
single-length canonical Huffman tables, 444 or 420 sampling."""
import struct
import numpy as np

_ZZ = [0,1,8,16,9,2,3,10,17,24,32,25,18,11,4,5,12,19,26,33,40,48,41,34,
       27,20,13,6,7,14,21,28,35,42,49,56,57,50,43,36,29,22,15,23,30,37,
       44,51,58,59,52,45,38,31,39,46,53,60,61,54,47,55,62,63]

def _dct_mat():
    n = np.arange(8)
    c = np.cos((2*n[None,:]+1)*n[:,None]*np.pi/16)
    a = np.full(8, (2/8)**0.5); a[0] = (1/8)**0.5
    return a[:,None]*c

def _huff(symbols, length=8):
    bits = [0]*16; bits[length-1] = len(symbols)
    code = 0; idx = 0; enc = {}
    c = 0
    for ln in range(1,17):
        for _ in range(bits[ln-1]):
            enc[symbols[idx]] = (ln, c); idx += 1; c += 1
        c <<= 1
    return bits, bytes(symbols), enc

class _BW:
    def __init__(self): self.buf = bytearray(); self.acc = 0; self.n = 0
    def put(self, val, nbits):
        for i in range(nbits-1, -1, -1):
            self.acc = (self.acc<<1) | ((val>>i)&1); self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF: self.buf.append(0)
                self.acc = 0; self.n = 0
    def align(self):
        while self.n: self.put(1, 1)  # pad with 1s per spec
    def raw(self, bs): self.align(); self.buf.extend(bs)

def _cat(v):
    t = 0; a = abs(v)
    while a: t += 1; a >>= 1
    return t

def encode_jpeg(pixels, subsample=False, restart_interval=0):
    pixels = np.asarray(pixels, dtype=np.float64)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        comps_px = [pixels]
    else:
        r, g, b = pixels[...,0], pixels[...,1], pixels[...,2]
        y  = 0.299*r + 0.587*g + 0.114*b
        cb = -0.168736*r - 0.331264*g + 0.5*b + 128
        cr = 0.5*r - 0.418688*g - 0.081312*b + 128
        comps_px = [y, cb, cr]
    nc = len(comps_px)
    if subsample and not gray:
        samp = [(2,2),(1,1),(1,1)]
    else:
        samp = [(1,1)]*nc
    hmax = max(s[0] for s in samp); vmax = max(s[1] for s in samp)
    mw, mh = 8*hmax, 8*vmax
    mx = (w+mw-1)//mw; my = (h+mh-1)//mh
    # build per-component padded planes at their own resolution
    planes = []
    for (ch,cv), px in zip(samp, comps_px):
        pw, ph = mx*ch*8, my*cv*8
        if (ch,cv) != (hmax,vmax):
            fx, fy = hmax//ch, vmax//cv
            # box-average downsample after edge-padding to full-res grid
            fp = np.pad(px, ((0, my*mh-h),(0, mx*mw-w)), mode="edge")
            px = fp.reshape(ph, fy, pw, fx).mean(axis=(1,3))
        else:
            px = np.pad(px, ((0, ph-px.shape[0]),(0, pw-px.shape[1])), mode="edge")
        planes.append(px)
    C = _dct_mat()
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [ (r<<4)|s for r in range(16) for s in range(1,11) ]
    dc_bits, dc_vals, dc_enc = _huff(dc_syms)
    ac_bits, ac_vals, ac_enc = _huff(ac_syms)
    out = bytearray(b"\xff\xd8")
    # DQT id 0, all ones
    out += b"\xff\xdb" + struct.pack(">H", 2+1+64) + b"\x00" + bytes([1]*64)
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i,(ch,cv) in enumerate(samp):
        sof += struct.pack(">BBB", i+1, (ch<<4)|cv, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2+len(sof)) + sof
    # DHT: class0 id0 (DC), class1 id0 (AC)
    dht = bytes([0x00]) + bytes(dc_bits) + dc_vals
    out += b"\xff\xc4" + struct.pack(">H", 2+len(dht)) + dht
    dht = bytes([0x10]) + bytes(ac_bits) + ac_vals
    out += b"\xff\xc4" + struct.pack(">H", 2+len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([nc])
    for i in range(nc): sos += bytes([i+1, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2+len(sos)) + sos
    bw = _BW()
    pred = [0]*nc
    mcu = 0; rst = 0
    for yy in range(my):
        for xx in range(mx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.raw(bytes([0xFF, 0xD0 + (rst % 8)])); rst += 1
                pred = [0]*nc
            mcu += 1
            for ci,((ch,cv), plane) in enumerate(zip(samp, planes)):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (yy*cv+by)*8; x0 = (xx*ch+bx)*8
                        blk = plane[y0:y0+8, x0:x0+8] - 128.0
                        Fq = np.round(C @ blk @ C.T).astype(int)
                        zzc = Fq.reshape(64)[_ZZ]
                        diff = int(zzc[0]) - pred[ci]; pred[ci] = int(zzc[0])
                        t = _cat(diff)
                        ln, code = dc_enc[t]; bw.put(code, ln)
                        if t:
                            bw.put(diff if diff >= 0 else diff + (1<<t) - 1, t)
                        run = 0
                        for k in range(1,64):
                            v = int(zzc[k])
                            if v == 0: run += 1; continue
                            while run >= 16:
                                ln, code = ac_enc[0xF0]; bw.put(code, ln); run -= 16
                            s = _cat(v)
                            ln, code = ac_enc[(run<<4)|s]; bw.put(code, ln)
                            bw.put(v if v >= 0 else v + (1<<s) - 1, s)
                            run = 0
                        if run:
                            ln, code = ac_enc[0x00]; bw.put(code, ln)
    bw.align()
    out += bw.buf + b"\xff\xd9"
    return bytes(out)


def _coef_blocks(pixels, subsample):
    """Forward path shared by the progressive encoder: color-convert,
    pad/downsample per component, DCT+quantize (all-ones table) every
    8x8 block → (w, h, samp, zigzag coef arrays over the MCU-padded
    block grid, actual (nby, nbx) per component)."""
    pixels = np.asarray(pixels, dtype=np.float64)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        comps_px = [pixels]
    else:
        r, g, b = pixels[..., 0], pixels[..., 1], pixels[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        comps_px = [y, cb, cr]
    nc = len(comps_px)
    samp = [(2, 2), (1, 1), (1, 1)] if (subsample and not gray) else [(1, 1)] * nc
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mw, mh = 8 * hmax, 8 * vmax
    mx = (w + mw - 1) // mw
    my = (h + mh - 1) // mh
    C = _dct_mat()
    coefs, nblocks = [], []
    for (ch, cv), px in zip(samp, comps_px):
        pw, ph = mx * ch * 8, my * cv * 8
        if (ch, cv) != (hmax, vmax):
            fx, fy = hmax // ch, vmax // cv
            fp = np.pad(px, ((0, my * mh - h), (0, mx * mw - w)), mode="edge")
            px = fp.reshape(ph, fy, pw, fx).mean(axis=(1, 3))
        else:
            px = np.pad(
                px, ((0, ph - px.shape[0]), (0, pw - px.shape[1])), mode="edge"
            )
        arr = np.zeros((my * cv, mx * ch, 64), np.int32)
        for by in range(my * cv):
            for bx in range(mx * ch):
                blk = px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                Fq = np.round(C @ blk @ C.T).astype(int)
                arr[by, bx] = Fq.reshape(64)[_ZZ]
        coefs.append(arr)
        cw = (w * ch + hmax - 1) // hmax
        chh = (h * cv + vmax - 1) // vmax
        nblocks.append(((chh + 7) // 8, (cw + 7) // 8))
    return w, h, samp, coefs, nblocks


def encode_progressive_jpeg(pixels, subsample=False, scans=None, restart_interval=0):
    """Progressive (SOF2) JPEG encoder: spectral selection + successive
    approximation, libjpeg-style EOB runs and buffered correction bits.
    ``scans`` is a list of (comp_indices, Ss, Se, Ah, Al); the default
    script exercises every decoder path (DC SA + refinement, AC bands at
    two approximation levels, refinement with history corrections)."""
    w, h, samp, coefs, nblocks = _coef_blocks(pixels, subsample)
    nc = len(coefs)
    if scans is None:
        allc = list(range(nc))
        scans = [(allc, 0, 0, 0, 1)]
        for c in range(nc):
            scans += [([c], 1, 5, 0, 2), ([c], 6, 63, 0, 2)]
        for c in range(nc):
            scans += [([c], 1, 5, 2, 1), ([c], 6, 63, 2, 1)]
        scans.append((allc, 0, 0, 1, 0))
        for c in range(nc):
            scans.append(([c], 1, 63, 1, 0))
    dc_syms = list(range(12))
    # AC alphabet: EOBn (n<<4)|0 for n=0..14, ZRL, and (run, size) pairs
    ac_syms = [(r << 4) for r in range(15)] + [0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    dc_bits, dc_vals, dc_enc = _huff(dc_syms)
    ac_bits, ac_vals, ac_enc = _huff(ac_syms)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (ch, cv) in enumerate(samp):
        sof += struct.pack(">BBB", i + 1, (ch << 4) | cv, 0)
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    dht = bytes([0x00]) + bytes(dc_bits) + dc_vals
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    dht = bytes([0x10]) + bytes(ac_bits) + ac_vals
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    for cs, ss, se, ah, al, in scans:
        sos = bytes([len(cs)])
        for c in cs:
            sos += bytes([c + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        bw = _BW()
        rst = 0
        if ss == 0:
            pred = {c: 0 for c in cs}
            # interleaved MCU walk for multi-component DC scans; the
            # component's own block grid otherwise
            if len(cs) > 1:
                c0 = cs[0]
                my_n = coefs[c0].shape[0] // samp[c0][1]
                mx_n = coefs[c0].shape[1] // samp[c0][0]
                units = []
                for yy in range(my_n):
                    for xx in range(mx_n):
                        mcu = []
                        for c in cs:
                            ch, cv = samp[c]
                            for by in range(cv):
                                for bx in range(ch):
                                    mcu.append((c, yy * cv + by, xx * ch + bx))
                        units.append(mcu)
            else:
                c = cs[0]
                nby, nbx = nblocks[c]
                units = [
                    [(c, by, bx)] for by in range(nby) for bx in range(nbx)
                ]
            for ui, unit in enumerate(units):
                if restart_interval and ui and ui % restart_interval == 0:
                    bw.raw(bytes([0xFF, 0xD0 + (rst % 8)]))
                    rst += 1
                    pred = {c: 0 for c in cs}
                for c, by, bx in unit:
                    v = int(coefs[c][by, bx, 0]) >> al
                    if ah == 0:
                        diff = v - pred[c]
                        pred[c] = v
                        t = _cat(diff)
                        ln, code = dc_enc[t]
                        bw.put(code, ln)
                        if t:
                            bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
                    else:
                        bw.put(v & 1, 1)
        else:
            c = cs[0]
            nby, nbx = nblocks[c]
            eobrun = 0
            pending = []  # correction bits deferred with the EOB run

            def flush_eob():
                nonlocal eobrun, pending
                if eobrun:
                    n = eobrun.bit_length() - 1
                    ln, code = ac_enc[n << 4]
                    bw.put(code, ln)
                    if n:
                        bw.put(eobrun - (1 << n), n)
                    eobrun = 0
                for b in pending:
                    bw.put(b, 1)
                pending = []

            blk_i = 0
            for by in range(nby):
                for bx in range(nbx):
                    if restart_interval and blk_i and blk_i % restart_interval == 0:
                        flush_eob()
                        bw.raw(bytes([0xFF, 0xD0 + (rst % 8)]))
                        rst += 1
                    blk_i += 1
                    blk = coefs[c][by, bx]
                    if ah == 0:
                        r = 0
                        for k in range(ss, se + 1):
                            v = int(blk[k])
                            t = abs(v) >> al
                            if t == 0:
                                r += 1
                                continue
                            flush_eob()
                            while r > 15:
                                ln, code = ac_enc[0xF0]
                                bw.put(code, ln)
                                r -= 16
                            s = t.bit_length()
                            sv = t if v > 0 else -t
                            ln, code = ac_enc[(r << 4) | s]
                            bw.put(code, ln)
                            bw.put(sv if sv >= 0 else sv + (1 << s) - 1, s)
                            r = 0
                        if r:
                            eobrun += 1
                            if eobrun == 0x7FFF:
                                flush_eob()
                    else:
                        ks = list(range(ss, se + 1))
                        absv = [abs(int(blk[k])) >> al for k in ks]
                        EOB = ss - 1
                        for i, k in enumerate(ks):
                            if absv[i] == 1:
                                EOB = k
                        r = 0
                        BR = []
                        for i, k in enumerate(ks):
                            t = absv[i]
                            if t == 0:
                                r += 1
                                continue
                            while r > 15 and k <= EOB:
                                flush_eob()
                                ln, code = ac_enc[0xF0]
                                bw.put(code, ln)
                                r -= 16
                                for b in BR:
                                    bw.put(b, 1)
                                BR = []
                            if t > 1:
                                # history coefficient: next magnitude bit
                                BR.append(t & 1)
                                continue
                            flush_eob()
                            ln, code = ac_enc[(r << 4) | 1]
                            bw.put(code, ln)
                            bw.put(1 if int(blk[k]) > 0 else 0, 1)
                            for b in BR:
                                bw.put(b, 1)
                            BR = []
                            r = 0
                        if r > 0 or BR:
                            eobrun += 1
                            pending.extend(BR)
                            if eobrun == 0x7FFF:
                                flush_eob()
            flush_eob()
        bw.align()
        out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)

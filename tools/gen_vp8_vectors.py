#!/usr/bin/env python3
"""Generate VP8 (lossy WebP) cross-pin vectors with the system libwebp.

Dev-side only (like the DuckDB oracle): libwebp is the de-facto display
truth for WebP in every browser, so the Scala decoder is pinned byte-exact
against it. Each vector stores the encoded WebP bytes plus libwebp's own
decode of them: the raw Y/U/V planes (pins the RFC 6386 reconstruction and
loop filter with no colorspace layer) and the RGBA output (pins the fancy
chroma upsampling + YUV->RGB conversion as displayed).

Vector format (little-endian u32s):
  magic 'VP8V' | w | h | nWebp | webp bytes | y (w*h) |
  u (ceil(w/2)*ceil(h/2)) | v (same) | rgba (w*h*4)
Content is deterministic (closed forms of x, y, and the vector index).
"""
import ctypes, os, struct, sys

LW = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
LW.WebPEncodeRGB.restype = ctypes.c_size_t
LW.WebPEncodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                             ctypes.c_int, ctypes.c_float,
                             ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
LW.WebPEncodeRGBA.restype = ctypes.c_size_t
LW.WebPEncodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                              ctypes.c_int, ctypes.c_float,
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
LW.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
LW.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
LW.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                             ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                             ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                             ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                             ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]


def content(kind, w, h, k):
    px = bytearray(w * h * 3)
    for yy in range(h):
        for xx in range(w):
            if kind == "flat":
                r = g = b = 96 + 8 * k
            elif kind == "hgrad":
                r = g = b = (xx * 255) // max(1, w - 1)
            elif kind == "vgrad":
                r = g = b = (yy * 255) // max(1, h - 1)
            elif kind == "checker":
                v = 220 if ((xx // 8) + (yy // 8)) % 2 == 0 else 40
                r = g = b = v
            elif kind == "noise":
                v = (xx * 31 + yy * 17 + k * 7) % 256
                r, g, b = v, (v * 3 + 50) % 256, (v * 7 + 100) % 256
            else:  # blocks: piecewise-flat color regions
                r = ((xx // 16) * 53 + k) % 256
                g = ((yy // 16) * 97 + k * 3) % 256
                b = ((xx // 16 + yy // 16) * 31) % 256
            i = (yy * w + xx) * 3
            px[i], px[i + 1], px[i + 2] = r, g, b
    return bytes(px)


def encode(rgb, w, h, q):
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = LW.WebPEncodeRGB(rgb, w, h, w * 3, float(q), ctypes.byref(out))
    assert n > 0
    return bytes(out[i] for i in range(n))


def alpha_content(kind, w, h, k):
    """RGBA content whose alpha plane exercises the ALPH chunk."""
    px = bytearray(w * h * 4)
    for yy in range(h):
        for xx in range(w):
            v = (xx * 13 + yy * 29 + k * 11) % 256
            if kind == "agrad":
                a = (xx * 255) // max(1, w - 1)
            elif kind == "abin":
                a = 255 if ((xx // 8) + (yy // 8)) % 2 == 0 else 0
            else:  # anoise
                a = (xx * 37 + yy * 17 + k * 3) % 256
            i = (yy * w + xx) * 4
            px[i], px[i + 1], px[i + 2], px[i + 3] = v, (v * 3) % 256, (v * 7) % 256, a
    return bytes(px)


def encode_rgba(rgba, w, h, q):
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = LW.WebPEncodeRGBA(rgba, w, h, w * 4, float(q), ctypes.byref(out))
    assert n > 0
    return bytes(out[i] for i in range(n))


def decode(webp):
    ow, oh = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_ubyte)()
    vp = ctypes.POINTER(ctypes.c_ubyte)()
    stride, uvstride = ctypes.c_int(), ctypes.c_int()
    yp = LW.WebPDecodeYUV(webp, len(webp), ctypes.byref(ow), ctypes.byref(oh),
                          ctypes.byref(up), ctypes.byref(vp),
                          ctypes.byref(stride), ctypes.byref(uvstride))
    w, h = ow.value, oh.value
    uw, uh = (w + 1) // 2, (h + 1) // 2
    ybuf = bytes(yp[r * stride.value + c] for r in range(h) for c in range(w))
    ubuf = bytes(up[r * uvstride.value + c] for r in range(uh) for c in range(uw))
    vbuf = bytes(vp[r * uvstride.value + c] for r in range(uh) for c in range(uw))
    rp = LW.WebPDecodeRGBA(webp, ctypes.c_size_t(len(webp)),
                           ctypes.byref(ow), ctypes.byref(oh))
    rgba = bytes(rp[i] for i in range(w * h * 4))
    return w, h, ybuf, ubuf, vbuf, rgba


def main(outdir):
    os.makedirs(outdir, exist_ok=True)
    cases = [
        ("flat", 16, 16, 75), ("flat", 32, 32, 50),
        ("hgrad", 32, 32, 75), ("vgrad", 48, 32, 75),
        ("checker", 32, 32, 75), ("checker", 33, 17, 75),
        ("noise", 32, 32, 10), ("noise", 32, 32, 50),
        ("noise", 32, 32, 95), ("noise", 64, 48, 75),
        ("blocks", 64, 64, 75), ("blocks", 33, 33, 40),
        ("noise", 128, 96, 60), ("hgrad", 17, 31, 90),
    ]
    alpha_cases = [
        ("agrad", 32, 32, 75), ("abin", 32, 32, 60),
        ("anoise", 33, 17, 75), ("anoise", 64, 48, 90),
    ]
    for k, (kind, w, h, q) in enumerate(cases + alpha_cases):
        if kind.startswith("a"):
            webp = encode_rgba(alpha_content(kind, w, h, k), w, h, q)
            assert b"ALPH" in webp, f"{kind}: no ALPH chunk emitted"
        else:
            webp = encode(content(kind, w, h, k), w, h, q)
        dw, dh, ybuf, ubuf, vbuf, rgba = decode(webp)
        assert (dw, dh) == (w, h)
        name = f"v{k:02d}_{kind}_{w}x{h}_q{q}.bin"
        with open(os.path.join(outdir, name), "wb") as f:
            f.write(b"VP8V")
            f.write(struct.pack("<III", w, h, len(webp)))
            f.write(webp)
            f.write(ybuf); f.write(ubuf); f.write(vbuf); f.write(rgba)
        print(name, len(webp), "bytes")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/vp8")

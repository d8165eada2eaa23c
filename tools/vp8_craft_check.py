#!/usr/bin/env python3
"""Decode crafted VP8 streams with the system libwebp and diff against
the Scala decoder's YUV dumps (dev-side cross-pin; see Vp8CraftProbe)."""
import ctypes, os, sys

LW = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
LW.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
LW.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                             ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                             ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                             ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                             ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]


def decode(webp):
    ow, oh = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_ubyte)()
    vp = ctypes.POINTER(ctypes.c_ubyte)()
    stride, uvstride = ctypes.c_int(), ctypes.c_int()
    yp = LW.WebPDecodeYUV(webp, len(webp), ctypes.byref(ow), ctypes.byref(oh),
                          ctypes.byref(up), ctypes.byref(vp),
                          ctypes.byref(stride), ctypes.byref(uvstride))
    if not yp:
        return None
    w, h = ow.value, oh.value
    uw, uh = (w + 1) // 2, (h + 1) // 2
    y = bytes(yp[r * stride.value + c] for r in range(h) for c in range(w))
    u = bytes(up[r * uvstride.value + c] for r in range(uh) for c in range(uw))
    v = bytes(vp[r * uvstride.value + c] for r in range(uh) for c in range(uw))
    return w, h, y, u, v


def main(d):
    names = sorted(f[:-5] for f in os.listdir(d) if f.endswith(".webp"))
    npass = 0
    for name in names:
        webp = open(os.path.join(d, name + ".webp"), "rb").read()
        ref = decode(webp)
        if ref is None:
            print(f"LIBWEBP-REJECT {name}")
            continue
        w, h, y, u, v = ref
        try:
            mine = open(os.path.join(d, name + ".mine"), "rb").read()
        except FileNotFoundError:
            print(f"NO-MINE {name} (libwebp ok {w}x{h})")
            continue
        uw, uh = (w + 1) // 2, (h + 1) // 2
        my_y = mine[:w * h]
        my_u = mine[w * h:w * h + uw * uh]
        my_v = mine[w * h + uw * uh:]
        ok = True
        for tag, a, b, rw in [("Y", my_y, y, w), ("U", my_u, u, uw), ("V", my_v, v, uw)]:
            bad = [(i, a[i], b[i]) for i in range(len(b)) if a[i] != b[i]]
            if bad:
                ok = False
                i, g, wv = bad[0]
                print(f"DIFF {name} {tag}: {len(bad)}/{len(b)} first at "
                      f"({i % rw},{i // rw}) got {g} want {wv} worst "
                      f"{max(abs(x[1] - x[2]) for x in bad)}")
        if ok:
            npass += 1
            print(f"OK   {name}")
    print(f"{npass}/{len(names)} crafted streams exact")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/vp8craft")

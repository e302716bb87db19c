#!/usr/bin/env python3
"""Extract the RFC 7932 (brotli) static tables from a local libbrotli.

The brotli format depends on three blobs of PUBLIC SPEC DATA that are
impractical to retype from RFC 7932's appendices:

  * the 122,784-byte static dictionary (RFC 7932 Appendix A),
  * the 121 word transforms (RFC 7932 Appendix B),
  * the 2,048-byte literal-context lookup table (RFC 7932 section 7.1).

This script reads them out of the reference implementation's shared
library (libbrotlicommon.so, exported symbols BrotliGetDictionary /
BrotliGetTransforms / _kBrotliContextLookupTable) and writes them as
binary resources for the Scala decoder. The transform extraction is
VALIDATED against the C implementation itself: for every one of the 121
transforms we apply our own reading of the (prefix, type, suffix)
semantics to sample dictionary words and require byte equality with
BrotliTransformDictionaryWord.

Resources written (committed; regeneration needs only this script and
any libbrotli >= 1.0):
  src/main/resources/graft/brotli/dictionary.bin   122784 bytes
  src/main/resources/graft/brotli/context_lut.bin  2048 bytes
  src/main/resources/graft/brotli/transforms.bin   [u8 n][n x (u8 plen,
      prefix, u8 type, u8 slen, suffix)]
"""
import ctypes
import os
import sys

LIB = os.environ.get("BROTLI_COMMON", "/root/miniconda/lib/libbrotlicommon.so")
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "main", "resources", "graft", "brotli")


class BrotliDictionary(ctypes.Structure):
    _fields_ = [
        ("size_bits_by_length", ctypes.c_uint8 * 32),
        ("offsets_by_length", ctypes.c_uint32 * 32),
        ("data_size", ctypes.c_size_t),
        ("data", ctypes.POINTER(ctypes.c_uint8)),
    ]


class BrotliTransforms(ctypes.Structure):
    _fields_ = [
        ("prefix_suffix_size", ctypes.c_uint16),
        ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
        ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
        ("num_transforms", ctypes.c_uint32),
        ("transforms", ctypes.POINTER(ctypes.c_uint8)),
        ("params", ctypes.POINTER(ctypes.c_uint8)),
        ("cutOffTransforms", ctypes.c_int16 * 10),
    ]


# RFC 7932 Appendix B transform operation ids
TF_IDENTITY = 0
TF_OMIT_LAST_1 = 1  # .. 9
TF_UPPERCASE_FIRST = 10
TF_UPPERCASE_ALL = 11
TF_OMIT_FIRST_1 = 12  # .. 20


def uppercase_inplace(b, i):
    """RFC 7932 section 8 uppercase step; returns bytes consumed."""
    if b[i] < 192:
        if ord('a') <= b[i] <= ord('z'):
            b[i] ^= 32
        return 1
    elif b[i] < 224:
        if i + 1 < len(b):
            b[i + 1] ^= 32
        return 2
    else:
        if i + 2 < len(b):
            b[i + 2] ^= 5
        return 3


def apply_transform(word, prefix, typ, suffix):
    """Our reading of RFC 7932 section 8 — validated against the C lib."""
    w = bytearray(word)
    if TF_OMIT_FIRST_1 <= typ <= TF_OMIT_FIRST_1 + 8:
        cut = typ - TF_OMIT_FIRST_1 + 1
        w = w[cut:] if cut < len(w) else bytearray()
    elif TF_OMIT_LAST_1 <= typ <= TF_OMIT_LAST_1 + 8:
        cut = typ - TF_OMIT_LAST_1 + 1
        w = w[:-cut] if cut < len(w) else bytearray()
    elif typ == TF_UPPERCASE_FIRST:
        if w:
            uppercase_inplace(w, 0)
    elif typ == TF_UPPERCASE_ALL:
        i = 0
        while i < len(w):
            i += uppercase_inplace(w, i)
    elif typ != TF_IDENTITY:
        raise AssertionError(f"unexpected transform type {typ}")
    return bytes(prefix) + bytes(w) + bytes(suffix)


def main():
    lib = ctypes.CDLL(LIB)
    lib.BrotliGetDictionary.restype = ctypes.POINTER(BrotliDictionary)
    lib.BrotliGetTransforms.restype = ctypes.POINTER(BrotliTransforms)
    lib.BrotliTransformDictionaryWord.restype = ctypes.c_int
    lib.BrotliTransformDictionaryWord.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.POINTER(BrotliTransforms), ctypes.c_int]

    d = lib.BrotliGetDictionary().contents
    assert d.data_size == 122784, d.data_size
    data = bytes(bytearray(d.data[i] for i in range(d.data_size)))
    # structural sanity: word sections for lengths 4..24, offsets consistent
    for ln in range(4, 25):
        nwords = 1 << d.size_bits_by_length[ln]
        assert d.offsets_by_length[ln] + nwords * ln <= d.data_size + 1, ln
    size_bits = bytes(bytearray(d.size_bits_by_length))
    offsets = b"".join(int(d.offsets_by_length[i]).to_bytes(4, "big") for i in range(32))

    t = lib.BrotliGetTransforms().contents
    assert t.num_transforms == 121, t.num_transforms
    trans = []
    for i in range(t.num_transforms):
        pid = t.transforms[3 * i]
        typ = t.transforms[3 * i + 1]
        sid = t.transforms[3 * i + 2]

        def str_at(idx):
            off = t.prefix_suffix_map[idx]
            ln = t.prefix_suffix[off]
            return bytes(bytearray(t.prefix_suffix[off + 1 + j] for j in range(ln)))
        trans.append((str_at(pid), typ, str_at(sid)))
    assert trans[0] == (b"", 0, b""), trans[0]

    # validate our transform semantics against the C implementation on
    # words of several lengths, all 121 transforms
    dst = (ctypes.c_uint8 * 256)()
    for wlen in (4, 5, 8, 12, 24):
        nwords = 1 << d.size_bits_by_length[wlen]
        for widx in (0, 1, nwords // 2, nwords - 1):
            off = d.offsets_by_length[wlen] + widx * wlen
            word = data[off:off + wlen]
            warr = (ctypes.c_uint8 * wlen)(*word)
            for ti in range(121):
                n = lib.BrotliTransformDictionaryWord(
                    dst, warr, wlen, ctypes.byref(t), ti)
                want = bytes(bytearray(dst[:n]))
                got = apply_transform(word, trans[ti][0], trans[ti][1], trans[ti][2])
                assert got == want, (wlen, widx, ti, got, want)

    lut_arr = (ctypes.c_uint8 * 2048).in_dll(lib, "_kBrotliContextLookupTable")
    lut = bytes(bytearray(lut_arr))
    assert len(lut) == 2048

    os.makedirs(OUT, exist_ok=True)
    # dictionary.bin: [32 x u8 size_bits][32 x u32be offsets][data]
    with open(os.path.join(OUT, "dictionary.bin"), "wb") as f:
        f.write(size_bits)
        f.write(offsets)
        f.write(data)
    with open(os.path.join(OUT, "context_lut.bin"), "wb") as f:
        f.write(lut)
    with open(os.path.join(OUT, "transforms.bin"), "wb") as f:
        f.write(bytes([len(trans)]))
        for p, typ, s in trans:
            f.write(bytes([len(p)]))
            f.write(p)
            f.write(bytes([typ]))
            f.write(bytes([len(s)]))
            f.write(s)
    print("dictionary.bin", 64 + 128 + len(data))
    print("context_lut.bin", len(lut))
    print("transforms.bin ok; 121 transforms validated against BrotliTransformDictionaryWord")


if __name__ == "__main__":
    sys.exit(main())

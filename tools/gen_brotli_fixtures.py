#!/usr/bin/env python3
"""Generate brotli differential fixtures with the reference encoder.

The Scala decoder (graft.ext.Brotli) has no JVM brotli library to
differential against in the sandbox, so the differential is FIXTURES:
streams produced here by libbrotli (via brotlicffi) across qualities,
window sizes and modes, committed as test resources. The INPUTS are not
committed — each fixture's input is produced by a deterministic
generator (64-bit LCG) that BrotliSpec mirrors bit-exactly, so the spec
regenerates the expected bytes and compares them against our decoder's
output for the committed .br stream.

Regeneration: /root/miniconda/bin/python3 tools/gen_brotli_fixtures.py
(needs brotlicffi and the extracted dictionary.bin for the dictword
fixture).
"""
import os
import sys

sys.path.insert(0, "/root/miniconda/lib/python3.13/site-packages")
import brotlicffi  # noqa: E402

HERE = os.path.dirname(__file__)
OUT = os.path.join(HERE, "..", "src", "test", "resources", "graft", "brotli")
DICT = os.path.join(HERE, "..", "src", "main", "resources", "graft", "brotli", "dictionary.bin")

MASK = (1 << 64) - 1


class Lcg:
    """Must match BrotliFixtures.Lcg in the Scala spec exactly."""

    def __init__(self, seed):
        self.x = (seed * 0x9E3779B97F4A7C15) & MASK

    def next(self):
        self.x = (self.x * 6364136223846793005 + 1442695040888963407) & MASK
        return (self.x >> 33) & 0x7FFFFFFF


WORDS = [
    "the", "of", "and", "to", "in", "that", "was", "his", "he", "it",
    "with", "is", "for", "as", "had", "you", "not", "be", "her", "on",
    "at", "by", "which", "have", "or", "from", "this", "him", "but", "all",
    "she", "they", "were", "my", "are", "me", "one", "their", "so", "an",
]


def text_english(n_words, seed):
    r = Lcg(seed)
    parts = []
    for i in range(n_words):
        w = WORDS[r.next() % len(WORDS)]
        m = r.next() % 17
        if m == 0:
            w = w.capitalize()
        elif m == 1:
            w = w.upper()
        parts.append(w)
        parts.append(". " if r.next() % 13 == 0 else " ")
    return "".join(parts).encode("utf-8")


def random_bytes(n, seed):
    r = Lcg(seed)
    return bytes(bytearray(r.next() % 256 for _ in range(n)))


def low_entropy(n, seed):
    r = Lcg(seed)
    return bytes(bytearray(ord("a") + r.next() % 3 for _ in range(n)))


def json_like(n_records, seed):
    r = Lcg(seed)
    recs = []
    for i in range(n_records):
        recs.append('{"id":%d,"name":"%s","score":%d,"tags":["%s","%s"]}' % (
            i, WORDS[r.next() % len(WORDS)], r.next() % 1000,
            WORDS[r.next() % len(WORDS)], WORDS[r.next() % len(WORDS)]))
    return ("[" + ",".join(recs) + "]").encode("utf-8")


UTF8_PARA = ("Füße tragen müde Wanderer über die Straße; " +
             "καλημέρα κόσμε; Привет мир; 你好世界. ").encode("utf-8")


def dict_words(n, seed):
    """Words straight out of the static dictionary: the encoder's best
    case for static-dictionary references (each word occurs once, so
    backward references cannot beat them)."""
    with open(DICT, "rb") as f:
        blob = f.read()
    size_bits = blob[:32]
    offsets = [int.from_bytes(blob[32 + 4 * i:36 + 4 * i], "big") for i in range(32)]
    data = blob[160:]
    r = Lcg(seed)
    parts = []
    for _ in range(n):
        ln = 4 + r.next() % 21  # lengths 4..24
        nwords = 1 << size_bits[ln]
        idx = r.next() % nwords
        off = offsets[ln] + idx * ln - 0  # offsets are into data
        parts.append(data[off:off + ln])
        parts.append(b" ")
    return b"".join(parts)


FIXTURES = [
    # (name, input bytes, quality, lgwin, mode)
    ("empty_q1", b"", 1, 22, brotlicffi.MODE_GENERIC),
    ("one_q11", b"a", 11, 22, brotlicffi.MODE_GENERIC),
    ("hello_q5", b"hello world", 5, 22, brotlicffi.MODE_GENERIC),
    ("english50k_q0", text_english(9000, 1), 0, 22, brotlicffi.MODE_GENERIC),
    ("english50k_q1", text_english(9000, 1), 1, 22, brotlicffi.MODE_GENERIC),
    ("english50k_q5", text_english(9000, 1), 5, 22, brotlicffi.MODE_GENERIC),
    ("english50k_q9", text_english(9000, 1), 9, 22, brotlicffi.MODE_TEXT),
    ("english50k_q11", text_english(9000, 1), 11, 22, brotlicffi.MODE_TEXT),
    ("caps20k_q11", text_english(4000, 2), 11, 22, brotlicffi.MODE_TEXT),
    ("dictwords_q11", dict_words(3000, 3), 11, 22, brotlicffi.MODE_TEXT),
    ("dictwords_q5", dict_words(3000, 3), 5, 22, brotlicffi.MODE_TEXT),
    ("utf8_q5", UTF8_PARA * 200, 5, 22, brotlicffi.MODE_TEXT),
    ("utf8_q11", UTF8_PARA * 200, 11, 22, brotlicffi.MODE_TEXT),
    ("random100k_q1", random_bytes(100000, 4), 1, 22, brotlicffi.MODE_GENERIC),
    ("random100k_q11", random_bytes(100000, 4), 11, 22, brotlicffi.MODE_GENERIC),
    ("lowent200k_q1", low_entropy(200000, 5), 1, 22, brotlicffi.MODE_GENERIC),
    ("lowent200k_q11", low_entropy(200000, 5), 11, 22, brotlicffi.MODE_GENERIC),
    ("big4m_q5_w24", text_english(700000, 6), 5, 24, brotlicffi.MODE_GENERIC),
    ("big4m_q5_w10", text_english(700000, 6), 5, 10, brotlicffi.MODE_GENERIC),
    ("big4m_q9_w18", text_english(700000, 6), 9, 18, brotlicffi.MODE_GENERIC),
    ("json20k_q11", json_like(2000, 7), 11, 22, brotlicffi.MODE_GENERIC),
    ("allbytes_q11", bytes(range(256)) * 64, 11, 22, brotlicffi.MODE_GENERIC),
]


def build_raw_frame(data):
    """Mirror of graft.ext.Brotli.compressRaw: uncompressed meta-blocks,
    wbits 16, empty-last terminator. Validated below by libbrotli."""
    out = bytearray()
    acc = 0
    nacc = 0

    def put(v, n):
        nonlocal acc, nacc
        acc |= (v & ((1 << n) - 1)) << nacc
        nacc += n
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    def align():
        nonlocal acc, nacc
        if nacc > 0:
            out.append(acc & 0xFF)
            acc = 0
            nacc = 0

    put(0, 1)  # WBITS = 16
    off = 0
    while off < len(data):
        chunk = min(1 << 24, len(data) - off)
        put(0, 1)  # ISLAST
        nib = 4 if chunk - 1 < (1 << 16) else (5 if chunk - 1 < (1 << 20) else 6)
        put(nib - 4, 2)
        put(chunk - 1, 4 * nib)
        put(1, 1)  # ISUNCOMPRESSED
        align()
        out.extend(data[off:off + chunk])
        off += chunk
    put(1, 1)
    put(1, 1)  # ISLAST, ISLASTEMPTY
    align()
    return bytes(out)


def main():
    os.makedirs(OUT, exist_ok=True)
    total = 0
    # the raw-framing differential: libbrotli must accept the exact
    # stream graft.ext.Brotli.compressRaw produces (the spec then pins
    # the Scala encoder to these bytes)
    for name, data in [("rawframe50k", text_english(9000, 1)),
                       ("rawframe0", b""), ("rawframe1", b"x"),
                       ("rawframe70k", random_bytes(70000, 8))]:
        frame = build_raw_frame(data)
        assert brotlicffi.decompress(frame) == data, name
        with open(os.path.join(OUT, name + ".brraw"), "wb") as f:
            f.write(frame)
        print(f"{name}: raw framing {len(data)} -> {len(frame)} (libbrotli-verified)")
    for name, data, q, w, mode in FIXTURES:
        br = brotlicffi.compress(data, mode=mode, quality=q, lgwin=w)
        assert brotlicffi.decompress(br) == data, name
        with open(os.path.join(OUT, name + ".br"), "wb") as f:
            f.write(br)
        total += len(br)
        print(f"{name}: {len(data)} -> {len(br)}")
    print(f"total committed: {total} bytes over {len(FIXTURES)} fixtures")


if __name__ == "__main__":
    sys.exit(main())

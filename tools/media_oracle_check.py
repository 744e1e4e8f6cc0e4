#!/usr/bin/env python3
"""First-principles recompute of the m1/m2/m3 multimodal oracle rows —
INDEPENDENT of the engine (r17 verdict item 1: the pinned MediaOracle
VALUES were engine-generated, so the DuckDB compare attested drift, not
correctness).

The fixtures are defined BEFORE the codecs: pixels / PCM samples / GIF
frames are pure splitmix64 integer streams, and every codec in the loop
is lossless (PNG, 16-bit WAV PCM, palette-indexed GIF), so
decode(encode(x)) == x and the whole pipeline is replayable here without
touching a codec:

  m1: 32x24 RGB pixels -> integer BT.601 luma -> explicit 9x8 bilinear
      sample -> 64-bit dHash -> all pairs Hamming <= 3
  m2: 16-bit PCM -> 65-segment mean-square loudness contour -> 64-bit
      contour dHash -> pairs Hamming <= 3
  m3: 8-level gray frames -> pixel-wise temporal mean luma -> same 9x8
      bilinear dHash -> pairs Hamming <= 3

The engine's banded-Hamming candidate stage equals brute-force all-pairs
at maxBits <= 3 by pigeonhole (4x16-bit bands: <= 3 flipped bits leave
>= 1 band untouched), so this replay computes all-pairs directly.

Float discipline: the Scala side evaluates the bilinear lerp in a fixed
IEEE-double expression order (see ImageCodec.dHashOfLumaD); this script
mirrors those expressions verbatim — Python floats are IEEE doubles, so
the comparison bits match exactly, not approximately.

Usage:
  python3 tools/media_oracle_check.py                 # print rows
  python3 tools/media_oracle_check.py --scala FILE    # diff vs pinned
      MediaOracle.scala rows (drift tripwire for the repo pin)
  python3 tools/media_oracle_check.py --engine DIR    # diff vs a
      graft.Verify dump (DIR holds m1_image_neardup/ etc. parquet)
Exit 0 iff every requested compare matches.
"""
import re
import sys

MASK = (1 << 64) - 1


def mix(z):
    z = (z + 0x9E3779B97F4A7C15) & MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
    return z ^ (z >> 31)


def dhash_of_luma(luma, w, h):
    """Explicit 9x8 bilinear dHash — expression-order twin of
    ImageCodec.dHashOfLumaD (luma entries are ints or floats)."""
    g = [0.0] * (9 * 8)
    for dy in range(8):
        for dx in range(9):
            u = (dx + 0.5) * w / 9.0 - 0.5
            v = (dy + 0.5) * h / 8.0 - 0.5
            if u < 0.0:
                u = 0.0
            if v < 0.0:
                v = 0.0
            if u > w - 1.0:
                u = w - 1.0
            if v > h - 1.0:
                v = h - 1.0
            x0 = int(u)
            y0 = int(v)
            x1 = min(x0 + 1, w - 1)
            y1 = min(y0 + 1, h - 1)
            fu = u - x0
            fv = v - y0
            top = luma[y0 * w + x0] * (1.0 - fu) + luma[y0 * w + x1] * fu
            bot = luma[y1 * w + x0] * (1.0 - fu) + luma[y1 * w + x1] * fu
            g[dy * 9 + dx] = top * (1.0 - fv) + bot * fv
    hsh = 0
    for yy in range(8):
        for xx in range(8):
            if g[yy * 9 + xx] > g[yy * 9 + xx + 1]:
                hsh |= 1 << (yy * 8 + xx)
    return hsh


def m1_hashes():
    """MediaQueries.fixtureImages replayed pre-codec (PNG is lossless)."""
    out = {}
    ids = list(range(30)) + list(range(100, 108)) + list(range(200, 204))
    for mid in ids:
        base = mid - 200 if mid >= 200 else mid - 100 if mid >= 100 else mid
        variant = mid >= 200
        w, h = 32, 24
        luma = [0] * (w * h)
        for y in range(h):
            for x in range(w):
                if variant and 9 <= y < 12 and 12 <= x < 16:
                    rgb = 0xFFFFFF
                else:
                    rgb = mix(base * 1000003 + y * 131 + x) & 0xFFFFFF
                r, gg, b = (rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF
                luma[y * w + x] = (299 * r + 587 * gg + 114 * b) // 1000
        out[mid] = dhash_of_luma(luma, w, h)
    return out


def m2_hashes():
    """MediaQueries.fixtureAudio replayed pre-codec (WAV PCM lossless):
    65-segment mean-square contour, AudioCodec.dHashOf order."""
    out = {}
    ids = list(range(20)) + list(range(100, 106)) + list(range(200, 202))
    for mid in ids:
        base = mid - 200 if mid >= 200 else mid - 100 if mid >= 100 else mid
        halve = mid >= 200
        n = 1600 + (base % 5) * 400
        samples = []
        for j in range(n):
            v = (mix(base * 7919 + j) & 0x7FFF) - 16384
            if halve:
                v >>= 1  # arithmetic shift, matches Java >>= on int
            samples.append(v)
        seg = [0.0] * 65
        for s in range(65):
            frm = (s * n) // 65
            until = ((s + 1) * n) // 65
            if until > frm:
                acc = 0.0
                for i in range(frm, until):
                    acc += float(samples[i]) * float(samples[i])
                seg[s] = acc / (until - frm)
        hsh = 0
        for s in range(64):
            if seg[s + 1] > seg[s]:
                hsh |= 1 << s
        out[mid] = hsh
    return out


def m3_hashes():
    """MediaQueries.fixtureVideos replayed pre-codec (indexed GIF is
    lossless): gray pixels make luma == gray exactly; temporal mean
    plane -> the same bilinear dHash."""
    out = {}
    ids = list(range(12)) + list(range(100, 106)) + list(range(200, 202))
    for mid in ids:
        base = mid - 200 if mid >= 200 else mid - 100 if mid >= 100 else mid
        variant = mid >= 200
        w, h = 16, 12
        n_frames = 3 + base % 3
        acc = [0.0] * (w * h)
        for f in range(n_frames):
            for y in range(h):
                for x in range(w):
                    if variant and f == 1 and 4 <= y < 7 and 6 <= x < 10:
                        g = 255
                    else:
                        g = (mix(base * 524287 + f * 8191 + y * 131 + x)
                             & 0x7) * 36
                    acc[y * w + x] += float(g)
        luma = [a / float(n_frames) for a in acc]
        out[mid] = dhash_of_luma(luma, w, h)
    return out


def pairs_of(hashes, max_bits=3):
    ids = sorted(hashes)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(hashes[a] ^ hashes[b]).count("1")
            if d <= max_bits:
                rows.append((a, b, d))
    return sorted(rows)


def scala_rows(path, name):
    """Parse mNRows out of MediaOracle.scala (drift-tripwire compare)."""
    src = open(path).read()
    m = re.search(name + r"[^=]*=\s*Seq\((.*?)\)\n", src, re.S)
    if not m:
        return None
    return sorted(
        (int(a), int(b), int(h))
        for a, b, h in re.findall(
            r"\((\d+)L,\s*(\d+)L,\s*(\d+)\)", m.group(1)))


def engine_rows(verify_dir, qname):
    import glob
    import pyarrow.parquet as pq
    files = glob.glob(f"{verify_dir}/{qname}/*.parquet")
    rows = []
    for f in files:
        t = pq.read_table(f)
        rows += list(zip(t.column("id_a").to_pylist(),
                         t.column("id_b").to_pylist(),
                         t.column("hamming").to_pylist()))
    return sorted((int(a), int(b), int(h)) for a, b, h in rows)


def main():
    args = sys.argv[1:]
    expect = {
        "m1_image_neardup": pairs_of(m1_hashes()),
        "m2_audio_neardup": pairs_of(m2_hashes()),
        "m3_video_neardup": pairs_of(m3_hashes()),
    }
    ok = True
    if not args:
        for name, rows in expect.items():
            print(f"{name}: {len(rows)} rows")
            for r in rows:
                print(f"  {r}")
    i = 0
    while i < len(args):
        if args[i] == "--scala":
            path = args[i + 1]
            i += 2
            for name, key in (("m1_image_neardup", "m1Rows"),
                              ("m2_audio_neardup", "m2Rows"),
                              ("m3_video_neardup", "m3Rows")):
                pinned = scala_rows(path, key)
                good = pinned == expect[name]
                ok &= good
                print(f"{'PASS' if good else 'FAIL'} {name} vs pinned "
                      f"{key}: recomputed={len(expect[name])} "
                      f"pinned={len(pinned) if pinned is not None else 'N/A'}")
                if not good and pinned is not None:
                    print(f"  missing={set(expect[name]) - set(pinned)}")
                    print(f"  spurious={set(pinned) - set(expect[name])}")
        elif args[i] == "--engine":
            vdir = args[i + 1]
            i += 2
            for name in expect:
                got = engine_rows(vdir, name)
                good = got == expect[name]
                ok &= good
                print(f"{'PASS' if good else 'FAIL'} {name} vs engine: "
                      f"recomputed={len(expect[name])} engine={len(got)}")
                if not good:
                    print(f"  missing={set(expect[name]) - set(got)}")
                    print(f"  spurious={set(got) - set(expect[name])}")
        else:
            print(f"unknown arg {args[i]}", file=sys.stderr)
            sys.exit(2)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Reference-output parity check for the deterministic JSONL stages.

Runs the REFERENCE's own stage functions (1-find-gradient.py's
compute_cutoffs/write_filtered, 2-label.py's emoji_frequency_analysis/
post_length_analysis/normalize_text) on a raw posts JSONL, then diffs the
result field-by-field against the Spark side's parquet dump
(graft.RefParity → engagementTiers / labelPosts). This verifies the
re-expression against the reference's actual Python output — the one axis
the DuckDB oracle (which checks Spark against a SQL re-expression) cannot.

Scope notes, declared up front:
 - The `emojis` package is not installable in this sandbox (zero egress),
   so a shim implementing emojis.count() over the SAME UTS #51
   emoji-sequence grammar as the engine's TextFunctions.EmojiClass is
   injected (keycaps, flag pairs, pictographic ZWJ chains with VS16 /
   skin-tone — each displayed emoji counts once, matching the package's
   database semantics over the public Unicode ranges). The parity
   therefore covers the normalization, counting plumbing, frequency,
   binning, and buckets plus the sequence matching; only database
   entries OUTSIDE the embedded public ranges remain out of reach.
 - Ratios: the engine carries integer ppm (floor(e*1e6/f), exact integer
   arithmetic); the reference carries IEEE floats. Values are compared to
   the 1-ppm quantization bound; TIER labels — the semantic output — must
   match exactly.
 - 23-split.py is NOT covered: its row assignment is random.shuffle /
   random.sample under Python's Mersenne Twister, a seeded-RNG contract
   the engine deliberately re-expresses as deterministic hash splits.

Usage: ref_parity.py <posts.jsonl> <sparkOutDir>
  (run `graft.RefParity <posts.jsonl> <sparkOutDir>` first)
"""
import importlib.util
import json
import logging
import os
import re
import sys
import tempfile

import pyarrow.parquet as pq

REF = "/root/reference"
TIER_TOL = 2e-6   # ppm truncation bound on the ratio value
FREQ_TOL = 1e-6   # ppm rounding bound on emoji frequency


def load_ref_module(fname, name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, fname))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


# Mirror of TextFunctions.PictographicRanges — the UTS #51-derived
# pictographic table embedded in the engine (ONE conceptual source; a
# drift here desynchronizes the parity harness from the engine's counts).
PICT_RANGES = [
    (0x00A9, 0x00A9), (0x00AE, 0x00AE), (0x203C, 0x203C), (0x2049, 0x2049),
    (0x2122, 0x2122), (0x2139, 0x2139), (0x2194, 0x2199), (0x21A9, 0x21AA),
    (0x231A, 0x231B), (0x2328, 0x2328), (0x23CF, 0x23CF), (0x23E9, 0x23F3),
    (0x23F8, 0x23FA), (0x24C2, 0x24C2), (0x25AA, 0x25AB), (0x25B6, 0x25B6),
    (0x25C0, 0x25C0), (0x25FB, 0x25FE), (0x2600, 0x27BF), (0x2934, 0x2935),
    (0x2B05, 0x2B07), (0x2B1B, 0x2B1C), (0x2B50, 0x2B50), (0x2B55, 0x2B55),
    (0x3030, 0x3030), (0x303D, 0x303D), (0x3297, 0x3297), (0x3299, 0x3299),
    (0x1F000, 0x1FAFF)]


def install_emojis_shim():
    """emojis.count over the engine's UTS #51 emoji-SEQUENCE grammar
    (TextFunctions.EmojiClass: keycaps, flag pairs, pictographic ZWJ
    chains with optional VS16/skin-tone) — the same matching the real
    `emojis` package database performs, minus database entries outside
    these public ranges. See module docstring for the parity scope."""
    pict = "[" + "".join(
        chr(a) if a == b else f"{chr(a)}-{chr(b)}" for a, b in PICT_RANGES) + "]"
    mod = "(?:\uFE0F|[\U0001F3FB-\U0001F3FF])?"
    cls = re.compile(
        "[#*0-9]\uFE0F?\u20E3"
        "|[\U0001F1E6-\U0001F1FF]{2}"
        f"|{pict}{mod}(?:\u200D{pict}{mod})*")
    shim = type(sys)("emojis")
    shim.count = lambda text, unique=False: (
        len(set(cls.findall(text))) if unique else len(cls.findall(text)))
    sys.modules["emojis"] = shim


def read_parquet_rows(path):
    t = pq.read_table(path)
    cols = t.column_names
    return [dict(zip(cols, r)) for r in zip(*[t[c].to_pylist() for c in cols])]


def main():
    jsonl, spark_dir = sys.argv[1], sys.argv[2]
    sys.path.insert(0, REF)
    install_emojis_shim()
    logger = logging.getLogger("ref_parity")
    logging.basicConfig(level=logging.WARNING)

    s1 = load_ref_module("1-find-gradient.py", "ref_stage1")
    s2 = load_ref_module("2-label.py", "ref_stage2")

    # ---- stage 1: reference run (its own cutoffs + tier loop) ----
    def key(p):
        return (p["post_text"], p.get("follower_count") or 0,
                p.get("total_likes_count") or 0, p.get("comments_count") or 0,
                p.get("shares_count") or 0)

    fails = 0
    ref_posts = None
    # clamp=0.05 is the reference default; the example corpus is
    # engagement-rich enough that every ratio clears it (all ratios = the
    # clamp, all posts Tier A) — so a second, unclamped run exercises the
    # quantile cutoffs and tier boundaries on distinct ratios.
    for clamp, subdir in [(0.05, "tiers"), (1.0, "tiers_unclamped")]:
        top_cut, bot_cut, n_seen = s1.compute_cutoffs(jsonl, clamp, 0.80, 0.40, logger)
        with tempfile.TemporaryDirectory() as td:
            out = os.path.join(td, "std.jsonl")
            s1.write_filtered(jsonl, {"std": out}, clamp, top_cut, bot_cut,
                              keep_bottom=True, logger=logger)
            posts = [json.loads(l) for l in open(out, encoding="utf-8")]
        if ref_posts is None:
            ref_posts = posts
        spark_tiers = read_parquet_rows(os.path.join(spark_dir, subdir))
        ref_sorted = sorted(posts, key=key)
        got_sorted = sorted(spark_tiers, key=lambda p: (
            p["post_text"], p["follower_count"], p["total_likes_count"],
            p["comments_count"], p["shares_count"]))
        if len(ref_sorted) != len(got_sorted):
            print(f"FAIL stage1 clamp={clamp}: {len(got_sorted)} spark rows "
                  f"vs {len(ref_sorted)} reference")
            fails += 1
            continue
        bad = []
        for r, g in zip(ref_sorted, got_sorted):
            if r["tier"] != g["tier"]:
                bad.append(("tier", r["tier"], g["tier"], r["post_text"][:40]))
            elif abs(g["ratio_ppm"] / 1e6 - r["engagement_ratio"]) > TIER_TOL:
                bad.append(("ratio", r["engagement_ratio"], g["ratio_ppm"], r["post_text"][:40]))
        if bad:
            print(f"FAIL stage1 clamp={clamp}: {len(bad)} mismatches; first: {bad[:3]}")
            fails += 1
        else:
            tiers = sorted(set(r["tier"] for r in ref_sorted))
            counts = {t: sum(1 for r in ref_sorted if r["tier"] == t) for t in tiers}
            print(f"PASS stage1 clamp={clamp} ({len(ref_sorted)} posts, tiers "
                  f"exact, ratio within {TIER_TOL}): {counts}")

    # ---- stage 2: reference per-post labeling over stage-1 output ----
    bins = s2.load_emoji_bins(None)
    ref_labels = []
    for p in ref_posts:
        text = s2.normalize_text(p["post_text"])
        if not text:
            continue
        ea = s2.emoji_frequency_analysis(text, bins)
        ref_labels.append({
            "post_text": text, "emoji_count": ea["emoji_count"],
            "text_length": ea["text_length"], "frequency": ea["frequency"],
            "emoji_usage": ea["usage"],
            "max_length": s2.post_length_analysis(text)})
    spark_labels = read_parquet_rows(os.path.join(spark_dir, "labels"))
    ref_sorted = sorted(ref_labels, key=lambda p: p["post_text"])
    got_sorted = sorted(spark_labels, key=lambda p: p["post_text"])
    if len(ref_sorted) != len(got_sorted):
        print(f"FAIL stage2: {len(got_sorted)} spark rows vs {len(ref_sorted)} reference")
        fails += 1
    else:
        bad = []
        for r, g in zip(ref_sorted, got_sorted):
            for f in ("emoji_count", "text_length", "emoji_usage", "max_length"):
                if r[f] != g[f]:
                    bad.append((f, r[f], g[f], r["post_text"][:40]))
            if abs(g["freq_ppm"] / 1e6 - r["frequency"]) > FREQ_TOL:
                bad.append(("frequency", r["frequency"], g["freq_ppm"], r["post_text"][:40]))
        if bad:
            print(f"FAIL stage2: {len(bad)} mismatches; first: {bad[:3]}")
            fails += 1
        else:
            print(f"PASS stage2 ({len(ref_sorted)} posts: emoji_count/text_length/"
                  f"emoji_usage/max_length exact, frequency within {FREQ_TOL})")

    print(f"== {3 - fails} pass, {fails} fail")
    sys.exit(1 if fails else 0)


main()

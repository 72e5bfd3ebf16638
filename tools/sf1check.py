#!/usr/bin/env python3
"""sf1-scale oracle check for the corpus dedup/text/multimodal families.

Two modes:

  sf1check.py <sfDir> <verifyOutDir>
      Legacy spot-check of an EXISTING graft.Verify dump: swaps the
      sf1-infeasible brute-force oracles (x4/x20) for an sf1-feasible
      independent formulation and delegates the compare to selfcheck.py.

  sf1check.py --all [--src SFDIR] [--work DIR] [--queries a,b] [--skip-build]
      THE STANDING GATE (r11 verdict item 3): one command that
      (1) builds-or-reuses the sf1 (k=10) and sf1-skew (k=10, skewPct=20)
          fixtures via graft.tools.ScaleUp from --src (default
          /root/testdata/sf0.1) under --work (default /tmp/graft_sf1check),
      (2) runs graft.Verify for the full spot-check list on BOTH fixtures,
      (3) runs the swapped-oracle selfcheck compare on each dump,
      (4) writes <work>/sf1check_manifest.json recording fixture params,
          query list and per-fixture outcome, and exits non-zero on any
          failure.

Why the swap (x4/x20 only): their committed oracles brute-force every
within-lang doc pair with a list_intersect — exact and fully independent,
but O(n^2 * len): at the 50k-doc sf1 fixture that is ~2*10^8 list
intersections. The swapped formulation is the count-everything
inverted-index join (posting self-join grouped by pair), which shares
NONE of the Spark engine's prefix / positional / suffix-bound / salt
machinery — precisely the machinery whose losslessness is under test.
x28's committed oracle is already the posting-join shape; the simhash /
perceptual / envelope oracles recompute hashes arithmetically and
brute-force PAIRS of 50k scalar hashes (not 50k shingle lists), which
DuckDB handles at sf1; all run unmodified.

The df >= 2 prune in the swapped oracles is volume-only and lossless: a
shingle seen in one document can co-occur with nothing, so it contributes
to no pair (doc sizes n_a/n_b still count every shingle).
"""
import sys, os, json, subprocess, tempfile

R6 = lambda e: f"floor(({e}) * 1000000 + 0.5) / 1000000"

SHINGLE_CTE = """WITH d AS (
  SELECT doc_id, lang, list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS sh
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)),
sz AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n FROM d),
p0 AS (SELECT doc_id, lang, unnest(sh) AS shingle FROM d),
df2 AS (SELECT lang, shingle FROM p0 GROUP BY 1, 2 HAVING count(*) >= 2),
p AS (SELECT p0.* FROM p0 JOIN df2 USING (lang, shingle)),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang AS lang,
    count(*) AS common
  FROM p a JOIN p b
    ON a.lang = b.lang AND a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3)"""

X4_SQL = f"""{SHINGLE_CTE}
SELECT doc_a, doc_b, lang,
  {R6("CAST(common AS DOUBLE) / (sa.n + sb.n - common)")} AS jaccard
FROM pairs
JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
WHERE {R6("CAST(common AS DOUBLE) / (sa.n + sb.n - common)")} >= 0.5
ORDER BY doc_a, doc_b"""

X20_SQL = f"""{SHINGLE_CTE}
SELECT doc_a, doc_b, n_a, n_b, common, jaccard, cont_a_in_b, cont_b_in_a
FROM (
  SELECT doc_a, doc_b, sa.n AS n_a, sb.n AS n_b, common,
    {R6("CAST(common AS DOUBLE) / (sa.n + sb.n - common)")} AS jaccard,
    {R6("CAST(common AS DOUBLE) / sa.n")} AS cont_a_in_b,
    {R6("CAST(common AS DOUBLE) / sb.n")} AS cont_b_in_a
  FROM pairs
  JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b)
WHERE greatest(cont_a_in_b, cont_b_in_a) >= 0.4
ORDER BY doc_a, doc_b"""

SWAPPED = {"x4_dedup_ngram_jaccard": X4_SQL,
           "x20_containment_dedup": X20_SQL}

# the full standing spot-check list (r11 verdict): exact + LSH + prefix
# family + graph CC (full AND incremental — x29 joined in r13, it was
# the heaviest corpus op without at-scale evidence) + simhash + split
# determinism + the BPE/backoff family + all three multimodal dedups.
# x32's unsampled brute-force twin stays excluded at sf1 by design
# (recorded since r8).
ALL_QUERIES = [
    "x1_dedup_exact", "x2_dedup_minhash_lsh", "x4_dedup_ngram_jaccard",
    "x11_dedup_clusters", "x29_dedup_clusters_update",
    "x20_containment_dedup", "x28_weighted_jaccard",
    "x31_simhash_hamming", "y1_train_val_test_split",
    "t16_stupid_backoff", "t17_token_estimator_train",
    "t18_bpe_train", "t19_bpe_encode",
    "m3_video_frame_dedup", "x34_perceptual_hash_dedup",
    "m4_audio_envelope_dedup", "x35_embedding_outliers",
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def check_dump(sf_dir, out_dir, required):
    """shadow-swap the sf1-infeasible oracles and run selfcheck. NEVER
    mutates the dump in place (r10 self-review: an in-place rewrite
    silently replaced the committed brute-force oracles, so a later
    plain selfcheck run verified against the swapped formulation while
    the record claimed the committed one ran)."""
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    missing = {q for q in required
               if q not in oracle or not os.path.exists(os.path.join(out_dir, q))}
    if missing:
        # an absent result dir means the swapped oracle would "verify"
        # nothing -- fail loudly instead of warning past it
        print(f"FAIL: dump is missing result/oracle for {sorted(missing)}")
        return 1
    shadow = tempfile.mkdtemp(prefix="sf1check_")
    for entry in os.listdir(out_dir):
        if entry != "oracle_sql.json":
            os.symlink(os.path.join(os.path.abspath(out_dir), entry),
                       os.path.join(shadow, entry))
    json.dump({**oracle, **{k: v for k, v in SWAPPED.items() if k in oracle}},
              open(os.path.join(shadow, "oracle_sql.json"), "w"))
    return subprocess.call([sys.executable,
                            os.path.join(os.path.dirname(__file__), "selfcheck.py"),
                            sf_dir, shadow])


def sbt_run(main_and_args):
    cmd = ["sbt", "--error", "runMain " + main_and_args]
    print(f"+ {cmd[-1]}", flush=True)
    return subprocess.call(cmd, cwd=REPO)


def run_all(argv):
    def opt(name, default):
        return argv[argv.index(name) + 1] if name in argv else default
    src = opt("--src", "/root/testdata/sf0.1")
    work = opt("--work", "/tmp/graft_sf1check")
    queries = opt("--queries", ",".join(ALL_QUERIES)).split(",")
    skip_build = "--skip-build" in argv
    fixtures = [("sf1", 10, 0), ("sf1_skew", 10, 20)]
    manifest = {"src": src, "work": work, "queries": queries, "fixtures": []}
    failures = []
    for tag, k, skew in fixtures:
        fdir = os.path.join(work, tag)
        built = False
        if not os.path.exists(os.path.join(fdir, "documents.parquet")):
            if skip_build:
                print(f"FAIL: fixture {fdir} absent and --skip-build given")
                failures.append(tag + ":no-fixture")
                continue
            rc = sbt_run(f"graft.tools.ScaleUp {src} {fdir} {k} {skew}")
            if rc != 0:
                failures.append(tag + ":scaleup")
                continue
            built = True
        out = os.path.join(work, f"out_{tag}")
        rc = sbt_run(f"graft.Verify {fdir} {out} {','.join(queries)}")
        if rc != 0:
            failures.append(tag + ":verify")
            continue
        rc = check_dump(fdir, out, set(queries))
        if rc != 0:
            failures.append(tag + ":compare")
        manifest["fixtures"].append(
            {"tag": tag, "dir": fdir, "k": k, "skew_pct": skew,
             "built_this_run": built, "out": out,
             "result": "pass" if rc == 0 else "FAIL"})
    manifest["failures"] = failures
    os.makedirs(work, exist_ok=True)
    path = os.path.join(work, "sf1check_manifest.json")
    json.dump(manifest, open(path, "w"), indent=1)
    print(f"manifest: {path}")
    print("SF1CHECK " + ("PASS" if not failures else f"FAIL {failures}"))
    return 1 if failures else 0


def main():
    if "--all" in sys.argv:
        sys.exit(run_all(sys.argv))
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    sys.exit(check_dump(sf_dir, out_dir,
                        {"x4_dedup_ngram_jaccard", "x20_containment_dedup",
                         "x28_weighted_jaccard"}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Adversarial-corpus cross-engine fuzz (dev tool, driver-side python):
builds a scratch SF dir whose documents / events / embeddings tables are
packed with the inputs most likely to make Spark and DuckDB disagree —
empty/whitespace-only texts, non-Latin-1 scripts (CJK/Greek/Cyrillic,
exercising the 2^37 shingle-token packing), emoji, embedded newlines,
single-trigram saturation, periodic repeats, dense near-dup template
clusters, duplicate timestamps, -0.0 vs 0.0 values (the gate compares
float BITS), malformed JSON props, hot user keys, zero / denormal /
duplicate / antipodal embedding vectors — then replays the ENTIRE
registered query set through the SAME Spark-vs-DuckDB gate as
tools/oracle_check.py.

Usage: python3 tools/fuzz_docs.py [seed] [--only name,...] [--ascii]
TPC-H-ish tables are copied from sf0.001, so the relational/ocean family
re-verifies on its usual inputs while the doc/event/embedding families run
on the adversarial ones.

Documented oracle contracts the corpus respects (library limits are wider;
the ORACLES bail loudly by design outside these):
 - words <= 32 chars (bpe CTEs' BpeMaxWordLen positional explode)
 - docs <= 256 tokens (dedup_substring capchk guard)
 - |embedding component| small enough that floor(v*1e6) fits BIGINT
 - |event value| <= ~1e6 (exact-decimal v^2 sums in DECIMAL(25,9); the
   histogram-quantile integer interpolation) — beyond it BOTH engines
   fail loudly with ANSI overflow rather than silently diverging
Excluded queries:
 - dedup_fuzzy_blocked — DuckDB's levenshtein() is BYTE-based while
   Spark's is codepoint-based ('内'→'內' is 1 in Spark, 2 in DuckDB), so
   cross-engine edit-distance parity only exists for ASCII; Spark-side
   exactness is proven by FuzzyPassJoinSpec's randomized brute force.
   `--ascii` closes this blind spot: the corpus swaps every non-ASCII
   text for an ASCII stand-in and adds PassJoin-targeted shapes (prefix
   lengths straddling the tau/2tau short-class boundaries, a 300-doc
   near-empty scope driving the short-class join, template clusters one
   or two edits apart), where byte- and codepoint-levenshtein agree —
   and dedup_fuzzy_blocked then runs through the gate like every other
   query. The near-empty scope stays at ~300 docs, not the 100k guard
   bound, because the DUCKDB oracle is the quadratic scoped cross —
   100k short docs would be 10^10 oracle levenshteins; the guard's own
   red path is pinned JVM-side by FuzzyPassJoinSpec instead.
 - salinity_schemel / troll_salinity_density — physical formulas whose
   domain is real sensor ranges; on the deliberately non-physical fuzz
   values (negative conductivity) numpy/Spark produce NaN while DuckDB's
   sqrt() ERRORS, an engine-primitive difference with no shared answer.
   Their cross-engine gate is the sf0.01 run on physical data.
"""
import json, os, random, shutil, subprocess, sys

SEED = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 1
ASCII = "--ascii" in sys.argv
BASE = "/root/testdata/sf0.001"
DIR = f"/root/repo/scratch/fuzz{SEED}" + ("a" if ASCII else "")
EXCLUDE = {"dedup_fuzzy_blocked", "salinity_schemel", "troll_salinity_density"}
# --ascii: edit distance agrees byte-vs-codepoint, so the fuzzy query joins
# the gate; the physics exclusions are value-domain, not encoding, and stay
ACTIVE_EXCLUDE = EXCLUDE - {"dedup_fuzzy_blocked"} if ASCII else EXCLUDE
EMB_DIM = 64


def build_corpus(rnd):
    docs = []
    did = 0

    def add(text, lang="en", source="web"):
        nonlocal did
        docs.append((did, text, lang, source, len(text)))
        did += 1

    # degenerate shapes (see the oracle contracts in the module docstring)
    add("")
    add(" ")
    add("\t\n  \n")
    add("a")
    add("ab")
    add("aaa" * 7)                       # single saturated trigram
    add(("ab" * 12 + " ") * 250)         # periodic 24-char words, 250 tokens
    add("word " * 250)                   # 1-token-periodic text
    add("line one\nline two\twith tab\nline one")
    if not ASCII:
        # non-Latin-1 scripts — shingle keys beyond 8 bits/char
        add("这是一个测试文档 重复 重复 重复 的内容", lang="zh")
        add("这是一个测试文档 重复 重复 重复 的內容", lang="zh")   # near-dup
        add("αβγδ εζηθ ικλμ νξοπ ρστυ φχψω " * 3, lang="el")
        add("съешь же ещё этих мягких французских булок", lang="ru")
        add("съешь же ещё этих мягких французских булок!", lang="ru")
        add("🎉🎊 emoji 🎉🎊 soup 🎉🎊 " * 4)
    else:
        # ASCII stand-ins keep the same shapes (repeats, near-dup pair,
        # punctuation-terminated variant) without leaving levenshtein's
        # byte==codepoint domain
        add("this is a test document repeat repeat repeat content", lang="zh")
        add("this is a test document repeat repeat repeat kontent", lang="zh")
        add("abcd efgh ijkl mnop qrst uvwx " * 3, lang="el")
        add("the quick brown fox jumps over the lazy dog", lang="ru")
        add("the quick brown fox jumps over the lazy dog!", lang="ru")
        add(":-) ;-) ascii :-) ;-) soup :-) ;-) " * 4)
        # PassJoin tau/2tau short-class boundaries (dedup_fuzzy_blocked has
        # nTokens=5, tau=8): 5-token prefixes of total char length 7..9 and
        # 15..17 land on both sides of the l<=tau / l<=2*tau splits
        for L in (7, 8, 9, 15, 16, 17):
            body = "abcdefghijklmnopq"[:L]
            add(body, source="edge")
            add(body[:-1] + "z" if L > 1 else "z", source="edge")
        # 300-doc near-empty scope: every doc inside the degenerate short
        # class, well under the 100k guard but enough mass that the
        # short-class join (not the segment index) produces the answer
        for i in range(300):
            add(rnd.choice(["a", "ab", "abc", "ax by", "a b c d", ""]) +
                ("" if i % 3 else " q"), source="shorts")
        # template cluster at edit distances 1-2 around the tau boundary:
        # ten 5-token bases, mutations substituting one or two words
        fw = ["cat", "dog", "fox", "owl", "bat", "elk", "ant", "bee"]
        for c in range(10):
            base5 = [rnd.choice(fw) for _ in range(5)]
            add(" ".join(base5), source="fz%d" % (c % 3))
            for m in range(rnd.randint(3, 6)):
                mut = list(base5)
                for _ in range(rnd.randint(1, 2)):
                    mut[rnd.randrange(5)] = rnd.choice(fw)
                add(" ".join(mut), source="fz%d" % (c % 3))
    # NULL text (r17, per-advice): the char-3 shingle dedup family
    # coalesces null->'' at the op boundary (Dedup.shingleKeys3), so a
    # null-text doc participates with the degenerate shingle set and must
    # pair with ''/null docs in its scope; the oracles mirror the coalesce.
    # Every OTHER text path null-propagates identically in both engines.
    # Two nulls in one scope + one in another: exercises null<->null and
    # null<->'' pairing AND the scope isolation.
    docs.append((did, None, "en", "web", 0)); did += 1
    docs.append((did, None, "en", "web", 0)); did += 1
    docs.append((did, None, "de", "books", 0)); did += 1
    # identical text across scopes must never pair
    add("identical across scopes", source="web")
    add("identical across scopes", source="books")
    add("identical across scopes", source="wiki")
    # dense template cluster (containment/minhash stress): one base doc,
    # many supersets and light mutations in one scope
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lambda", "mu"]
    base = " ".join(rnd.choices(words, k=rnd.randint(20, 40)))
    add(base, source="tmpl")
    for i in range(rnd.randint(15, 40)):
        extra = " ".join(rnd.choices(words, k=rnd.randint(1, 10)))
        add(base + " " + extra, source="tmpl")
    for i in range(rnd.randint(8, 25)):
        toks = base.split()
        toks[rnd.randrange(len(toks))] = rnd.choice(words)
        add(" ".join(toks), source="tmpl")
    # random filler across sources/langs so stats queries have mass —
    # explicit short tokens (<= 12 chars) respect the 32-char word cap
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    for i in range(150):
        ntok = rnd.randint(1, 60)
        t = " ".join("".join(rnd.choice(alphabet)
                             for _ in range(rnd.randint(1, 12)))
                     for _ in range(ntok))
        add(t, lang=rnd.choice(["en", "de", "fr"]),
            source=rnd.choice(["web", "books", "wiki"]))
    return docs


def build_events(rnd):
    # (event_id, ts_us, user_id, event_type, value, props)
    rows = []
    eid = 0
    base_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in µs

    def add(ts_us, user, etype, value, props='{"k": 1}'):
        nonlocal eid
        rows.append((eid, ts_us, user, etype, value, props))
        eid += 1

    types = ["click", "view", "purchase", "signup", "error"]
    # same-microsecond burst for one user: total orderings must not rely
    # on ts alone (every window in the repo orders by a unique key too)
    for i in range(6):
        add(base_us + 1_000_000, 1, types[i % 5], float(i))
    # byte-identical rows except event_id
    for i in range(3):
        add(base_us + 2_000_000, 2, "click", 7.5)
    # -0.0 vs 0.0 (the gate compares float BITS on sorted columns) and
    # value ties across users
    add(base_us + 3_000_000, 3, "view", 0.0)
    add(base_us + 3_500_000, 3, "view", -0.0)
    # |value| <= 1e6: the exact-decimal replay queries (value_autocorr,
    # bootstrap_ci) sum v^2 in DECIMAL(25,9) and the histogram-quantile
    # interpolation multiplies row-count by integer cent-span — beyond the
    # envelope BOTH engines fail loudly (ANSI overflow), by design
    add(base_us + 4_000_000, 4, "purchase", 1e6)
    add(base_us + 4_500_000, 4, "purchase", 1e-15)
    add(base_us + 5_000_000, 4, "purchase", -42.5)
    # malformed / degenerate / unicode props (json_props_stats hardening)
    add(base_us + 6_000_000, 5, "click", 1.0, "not json")
    add(base_us + 6_100_000, 5, "click", 1.0, "")
    add(base_us + 6_200_000, 5, "click", 1.0, "{}")
    add(base_us + 6_300_000, 5, "click", 1.0, '{"k": null}')
    add(base_us + 6_400_000, 5, "click", 1.0, '{"键": "值", "k": 3}')
    # exact 6-hour session gap (sessionize boundary: gap == threshold)
    add(base_us + 10_000_000, 6, "view", 1.0)
    add(base_us + 10_000_000 + 6 * 3600 * 1_000_000, 6, "view", 2.0)
    add(base_us + 10_000_000 + 6 * 3600 * 1_000_000 - 1, 7, "view", 3.0)
    # hot key: one user, hundreds of events inside an hour (seed-varied)
    t = base_us + 86_400_000_000
    for i in range(rnd.randint(150, 500)):
        t += rnd.randint(1, 12_000_000)
        add(t, 8, rnd.choice(types), round(rnd.uniform(0, 400), 2),
            '{"k": %d}' % rnd.randint(0, 99))
    # single-event users, month-boundary timestamps, unicode event type
    add(base_us + 30 * 86_400_000_000 - 1, 9, "signup", 5.0)
    add(base_us + 30 * 86_400_000_000, 10, "purchase", 6.0)
    add(base_us + 7_000_000, 11, "其他", 1.25)
    add(base_us + 7_100_000, 12, "", 1.25)
    # background traffic across the month for the windowed/daily queries
    for i in range(400):
        u = rnd.randint(0, 14)
        ts = base_us + rnd.randint(0, 30 * 86_400_000_000 - 1)
        add(ts, u, rnd.choice(types), round(rnd.uniform(0, 400), 2),
            '{"k": %d}' % rnd.randint(0, 99))
    rows.sort(key=lambda r: r[1])
    return [(i,) + r[1:] for i, r in enumerate(rows)]


def build_embeddings(rnd):
    # (vec_id, [f32]*EMB_DIM, label)
    rows = []
    vid = 0

    def add(vec, label=0):
        nonlocal vid
        rows.append((vid, [float(v) for v in vec], label))
        vid += 1

    add([0.0] * EMB_DIM)                         # zero vector (norm 0)
    add([1e-30] * EMB_DIM, 1)                    # denormal-ish components
    add([1.0] * EMB_DIM, 2)
    add([-1.0] * EMB_DIM, 2)                     # antipodal (cosine -1)
    base = [rnd.uniform(-1, 1) for _ in range(EMB_DIM)]
    add(base, 3)
    add(base, 3)                                  # exact duplicate, new id
    add([v + 1e-7 for v in base], 3)              # near-duplicate
    add([-v for v in base], 4)
    # one-hot corners and sparse vectors
    for d in (0, 1, EMB_DIM - 1):
        v = [0.0] * EMB_DIM
        v[d] = 1.0
        add(v, 5)
    # clustered filler: 10 loose gaussian-ish clusters
    for c in range(10):
        center = [rnd.uniform(-1, 1) for _ in range(EMB_DIM)]
        for i in range(18):
            add([x + rnd.uniform(-0.05, 0.05) for x in center], c)
    return rows


def main():
    only = None
    for a in sys.argv:
        if a.startswith("--only"):
            if "=" not in a:
                sys.exit("usage: --only=name1,name2 (the = form)")
            only = a.split("=", 1)[1]
    rnd = random.Random(SEED)
    os.makedirs(DIR, exist_ok=True)
    for t in "region nation customer supplier part orders lineitem".split():
        dst = f"{DIR}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy2(f"{BASE}/{t}.parquet", dst)
    import pyarrow as pa
    import pyarrow.parquet as pq

    def write(name, tbl):
        path = f"{DIR}/{name}.parquet"
        if os.path.exists(path):
            os.remove(path)
        pq.write_table(tbl, path)
        print(f"[fuzz] {tbl.num_rows} adversarial {name} -> {path}")

    docs = build_corpus(rnd)
    write("documents", pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array([d[2] for d in docs], pa.string()),
        "source": pa.array([d[3] for d in docs], pa.string()),
        "n_chars": pa.array([d[4] for d in docs], pa.int64()),
    }))
    ev = build_events(rnd)
    write("events", pa.table({
        "event_id": pa.array([r[0] for r in ev], pa.int64()),
        "ts": pa.array([r[1] for r in ev], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in ev], pa.int64()),
        "event_type": pa.array([r[3] for r in ev], pa.string()),
        "value": pa.array([r[4] for r in ev], pa.float64()),
        "props": pa.array([r[5] for r in ev], pa.string()),
    }))
    em = build_embeddings(rnd)
    write("embeddings", pa.table({
        "vec_id": pa.array([r[0] for r in em], pa.int64()),
        "embedding": pa.array([r[1] for r in em], pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in em], pa.int32()),
    }))
    if only:
        names = only
    else:
        # the registered-query list comes from the last Verify run's
        # oracle_sql.json; running WITHOUT it would silently drop the
        # documented EXCLUDE set (the gate would then fail on exactly the
        # engine-primitive divergences excluded by design), so refuse
        reg_path = "/root/repo/target/verify_out/oracle_sql.json"
        if not os.path.exists(reg_path):
            sys.exit(f"[fuzz] {reg_path} missing — run "
                     "`python3 tools/oracle_check.py` once first so the "
                     "registry (minus the documented exclusions) is known")
        allq = set(json.load(open(reg_path)))
        names = ",".join(sorted(allq - ACTIVE_EXCLUDE))
    cmd = [sys.executable, "tools/oracle_check.py", DIR, f"--only={names}"]
    r = subprocess.run(cmd, cwd="/root/repo")
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()

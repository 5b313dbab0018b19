"""Curation operators: decontamination, PII scrub, stratified sampling,
shard packing, incremental dedup — engineered-input unit tests (the driver
oracle covers the corpus-scale behavior)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pdf_parser_spark.operators import curation
from tests.conftest import SF001


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_decontaminate_flags_shared_trigram_only(spark):
    # doc 0 (0 % 37 == 0) seeds the benchmark with its first 8 words
    docs = _docs(spark, [
        (0, "alpha beta gamma delta epsilon zeta eta theta TAIL NOT IN SNIPPET", "en", "s", 1),
        (1, "prefix words then alpha beta gamma inside a sentence", "en", "s", 1),
        (2, "completely unrelated text with no overlap at all", "en", "s", 1),
        (3, "TAIL NOT IN SNIPPET appears here but past the snippet cut", "en", "s", 1),
    ])
    out = {r["doc_id"]: r for r in
           curation.decontaminate(docs, curation.benchmark_snippets(docs)).collect()}
    assert out[0]["contaminated"] and out[0]["n_hits"] >= 6  # its own snippet
    assert out[1]["contaminated"] and out[1]["n_hits"] == 1  # 'alpha beta gamma'
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    # doc 3 shares words 9+ of doc 0, which the 8-word snippet must NOT cover
    assert not out[3]["contaminated"]


def test_decontaminate_bloom_equals_exact_path(spark):
    # 80 docs, doc 0 and 37 seed the benchmark; a few docs quote snippet
    # trigrams, most don't — the bloom variant must reproduce the exact
    # answer row-for-row (no false negatives + exact verify of survivors)
    rows = []
    for i in range(80):
        base = f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g w{i}h tail{i} more{i}"
        if i % 7 == 3:  # quote words 3..5 of doc 0's snippet
            base += " w0c w0d w0e"
        rows.append((i, base, "en", "s", 1))
    docs = _docs(spark, rows)
    bench = curation.benchmark_snippets(docs)
    exact = curation.decontaminate(docs, bench).collect()
    bloom = curation.decontaminate_bloom(docs, bench).collect()
    assert [tuple(r) for r in exact] == [tuple(r) for r in bloom]
    assert any(r["contaminated"] and r["doc_id"] % 7 == 3 for r in exact)


def test_decontaminate_bloom_prunes_before_exact_verify(spark):
    # the prefilter's reason to exist: on a mostly-clean corpus, far fewer
    # shingles reach the exact semi join than the corpus emits
    import numpy as np

    rows = [(i, f"a{i} b{i} c{i} d{i} e{i} f{i} g{i} h{i} i{i} j{i}",
             "en", "s", 1) for i in range(1, 300)]  # no doc_id%37==0 quoters
    rows.append((0, "s0 s1 s2 s3 s4 s5 s6 s7 s8 s9", "en", "s", 1))  # seeds bench
    docs = _docs(spark, rows)
    bench_sh = (
        curation.benchmark_snippets(docs)
        .select(F.explode(F.array_distinct(
            curation.word_shingles(F.col("snippet"), 3))).alias("s"))
        .distinct()
    )
    hvals = np.array([r.h for r in bench_sh.select(F.xxhash64("s").alias("h")).collect()])
    m = max(64, -(-(curation.BLOOM_BITS_PER_KEY * len(hvals)) // 8) * 8)
    bits = curation._bloom_build(hvals, m)
    # no false negatives: every benchmark hash must probe positive
    pos = curation._bloom_bit_positions(hvals, m)
    assert bool(((bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0)
                .all())
    # corpus-side: of ~2400 distinct clean shingles only doc 0's 8 (plus
    # rare fp) may pass — assert the prune is at least 10x
    doc_sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(
            curation.word_shingles(F.col("text"), 3))).alias("s"),
    ).withColumn("h", F.xxhash64("s"))
    hs = doc_sh.select("h").toPandas()["h"].to_numpy()
    p = curation._bloom_bit_positions(hs, m)
    passed = int(((bits[p >> 3] & (np.uint8(1) << (p & 7).astype(np.uint8))) != 0)
                 .all(axis=0).sum())
    assert passed < len(hs) / 10, (passed, len(hs))
    # and the full operator still agrees with the exact path on this corpus
    assert (curation.decontaminate_bloom(docs, curation.benchmark_snippets(docs))
            .where("contaminated").count()
            == curation.decontaminate(docs, curation.benchmark_snippets(docs))
            .where("contaminated").count())


def test_decontaminate_bloom_empty_benchmark(spark):
    docs = _docs(spark, [(1, "some plain text here", "en", "s", 1)])  # no %37 rows
    out = curation.decontaminate_bloom(
        docs, curation.benchmark_snippets(docs)).collect()
    assert len(out) == 1 and not out[0]["contaminated"] and out[0]["n_hits"] == 0


def test_charset_sniff_detects_and_decodes(spark):
    from pdf_parser_spark.operators import curation

    text = "snakk om vær: grønn æøå"
    rows = [
        (0, text.encode("utf-8")),
        (1, b"\xef\xbb\xbf" + text.encode("utf-8")),
        (2, b"\xff\xfe" + text.encode("utf-16-le")),
        (3, b"\xfe\xff" + text.encode("utf-16-be")),
        (4, text.encode("latin-1")),          # æøå bytes are invalid UTF-8
        (5, b""),                              # empty: trivially valid UTF-8
        # documented limitation: BOM-less ASCII UTF-16 interleaves NULs,
        # which ARE valid UTF-8 — classified utf-8 (WHATWG BOM-first)
        (6, "ascii".encode("utf-16-le")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    out = {r["doc_id"]: r for r in curation.sniff_decode(df).collect()}
    want_md5 = hashlib.md5(text.encode("utf-8")).hexdigest()
    assert out[0]["charset"] == "utf-8" and out[0]["text_md5"] == want_md5
    assert out[1]["charset"] == "utf-8-bom" and out[1]["text_md5"] == want_md5
    assert out[2]["charset"] == "utf-16-le" and out[2]["text_md5"] == want_md5
    assert out[3]["charset"] == "utf-16-be" and out[3]["text_md5"] == want_md5
    assert out[4]["charset"] == "latin-1" and out[4]["text_md5"] == want_md5
    assert out[5]["charset"] == "utf-8"
    assert out[5]["text_md5"] == hashlib.md5(b"").hexdigest()
    assert out[6]["charset"] == "utf-8"


def test_with_mixed_encodings_round_trips(spark):
    from pdf_parser_spark.operators import curation

    docs = _docs(spark, [(i, f"text number {i}", "en", "s", 1)
                         for i in range(10)])
    out = {r["doc_id"]: r for r in
           curation.sniff_decode(curation.with_mixed_encodings(docs))
           .collect()}
    for i in range(10):
        exp = f"text number {i}" + ("é." if i % 5 == 4 else "")
        assert out[i]["text_md5"] == hashlib.md5(exp.encode("utf-8")).hexdigest()
    assert [out[i]["charset"] for i in range(5)] == [
        "utf-8", "utf-8-bom", "utf-16-le", "utf-16-be", "latin-1"]


def test_nfc_normalize_canonicalizes_decomposed_forms(spark):
    import unicodedata

    from pdf_parser_spark.operators import curation

    docs = _docs(spark, [
        (0, "plain ascii", "en", "s", 1),
        (1, "café", "en", "s", 1),           # decomposed e+acute
        (2, "caf\u00e9", "en", "s", 1),      # precomposed
        (3, "Ångström", "en", "s", 1),    # ANGSTROM SIGN -> Å
        (4, "ḍ̇", "en", "s", 1),          # multi-mark reorder case
    ])
    out = {r["doc_id"]: r for r in curation.nfc_normalize_docs(docs).collect()}
    assert not out[0]["changed"]
    assert out[1]["changed"] and not out[2]["changed"]
    # decomposed and precomposed collapse to the SAME canonical bytes —
    # the reason exact dedup needs this step
    assert out[1]["text_md5"] == out[2]["text_md5"]
    assert out[3]["changed"]  # U+212B normalizes to U+00C5
    for i, s in [(3, "Ångström"), (4, "ḍ̇")]:
        exp = unicodedata.normalize("NFC", s).encode("utf-8")
        assert out[i]["text_md5"] == hashlib.md5(exp).hexdigest()
    # injection synthesis: %3==0 decomposed suffix flips changed, %3==1
    # composed suffix does not
    docs2 = _docs(spark, [(i, "x", "en", "s", 1) for i in range(6)])
    out2 = {r["doc_id"]: r["changed"] for r in
            curation.nfc_normalize_docs(
                curation.with_denormalized(docs2)).collect()}
    assert out2 == {0: True, 1: False, 2: False, 3: True, 4: False, 5: False}


def test_pii_scrub_counts_and_redacts_byte_exactly(spark):
    text = ("Reach a.b+c@x.co or DUP a.b+c@x.co at 192.168.1.1 "
            "or call +1-555-0199; version 1.2.3.4 too")
    expected_clean = ("Reach <EMAIL> or DUP <EMAIL> at <IP> "
                      "or call <PHONE>; version <IP> too")
    docs = _docs(spark, [(1, text, "en", "s", 1)])
    row = curation.pii_scrub(docs).collect()[0]
    assert (row["n_emails"], row["n_ips"], row["n_phones"]) == (2, 2, 1)
    assert row["clean_md5"] == hashlib.md5(expected_clean.encode()).hexdigest()


def test_with_synthetic_pii_matches_scrub_counts(spark):
    docs = _docs(spark, [(i, f"base text {i}", "en", "s", 1) for i in range(8)])
    out = {r["doc_id"]: r for r in
           curation.pii_scrub(curation.with_synthetic_pii(docs)).collect()}
    for i in range(8):
        want = {0: (2, 0, 0), 1: (0, 1, 0), 2: (0, 0, 1), 3: (0, 0, 0)}[i % 4]
        assert (out[i]["n_emails"], out[i]["n_ips"], out[i]["n_phones"]) == want


def test_stratified_sample_is_deterministic_and_drops_unplanned_langs(spark):
    docs = _docs(spark, [(i, "t", ["en", "zh", "xx"][i % 3], "s", 1) for i in range(300)])
    a = curation.stratified_sample(docs).collect()
    b = curation.stratified_sample(docs).collect()
    assert a == b and len(a) > 0
    langs = {r["lang"] for r in a}
    assert "xx" not in langs  # not in the rate plan -> dropped
    # rate 0 keeps nothing; rate 10000 keeps everything
    all_en = curation.stratified_sample(docs, {"en": 10000, "zh": 0})
    got = [r["lang"] for r in all_en.collect()]
    assert got == ["en"] * 100


def test_pack_shards_sequential_prefix_sum(spark):
    # 3 docs x 300 tokens in one source with budget 500:
    # prefix sums before each doc are 0, 300, 600 -> shards 0, 0, 1
    rows = [(i, " ".join(["w"] * 300), "en", "A", 1) for i in range(3)]
    rows.append((10, " ".join(["w"] * 10), "en", "B", 1))  # other source: shard 0
    out = {r["doc_id"]: r for r in
           curation.pack_shards(_docs(spark, rows), budget_tokens=500).collect()}
    assert [out[i]["shard_id"] for i in range(3)] == [0, 0, 1]
    assert out[10]["shard_id"] == 0 and out[10]["n_tokens"] == 10


def test_incremental_dedup_verdicts(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = _docs(spark, [
        (0, base, "en", "s", 1),                      # index doc
        (1, "  THE  quick brown fox jumps over the lazy dog again and again today ",
         "en", "s", 1),                               # exact dup after normalization
        (2, base.replace("today", "tomorrow"), "en", "s", 1),  # near dup (shares bands)
        (3, "entirely different content with zero overlap whatsoever in any shingle",
         "en", "s", 1),                               # novel
    ])
    out = {r["doc_id"]: r["verdict"] for r in curation.incremental_dedup(docs).collect()}
    assert set(out) == {1, 2, 3}  # index doc 0 not in the batch output
    assert out[1] == "dup_exact"
    assert out[2] == "near_dup"
    assert out[3] == "novel"


def test_lm_coverage_vocab_rank_and_integer_coverage(spark):
    # doc 0 (clean subset: 0 % 7 == 0) defines the vocab: 'aa' x3 rank 1,
    # 'bb' x2 rank 2, 'cc' x1 rank 3 (count desc, token asc tie-break)
    docs = _docs(spark, [
        (0, "aa aa aa bb bb cc", "en", "s", 1),
        (1, "aa bb cc cc", "en", "s", 1),      # all in vocab
        (2, "aa zz zz zz", "en", "s", 1),      # 1 of 4 in vocab
        (3, "qq rr ss", "en", "s", 1),         # nothing in vocab
    ])
    vocab = {r["token"]: r["rank"] for r in curation.fit_vocab(docs).collect()}
    assert vocab == {"aa": 1, "bb": 2, "cc": 3}
    out = {r["doc_id"]: r for r in curation.lm_coverage(docs, curation.fit_vocab(docs)).collect()}
    assert out[1]["coverage_bp"] == 10000 and out[1]["sum_rank"] == 1 + 2 + 3 + 3
    assert out[2]["n_in_vocab"] == 1 and out[2]["coverage_bp"] == 2500
    assert out[3]["n_in_vocab"] == 0 and out[3]["sum_rank"] == 0 and out[3]["coverage_bp"] == 0
    # tie-break: equal counts rank by token asc
    docs2 = _docs(spark, [(0, "zz aa zz aa", "en", "s", 1)])
    v2 = {r["token"]: r["rank"] for r in curation.fit_vocab(docs2).collect()}
    assert v2 == {"aa": 1, "zz": 2}


def test_linkgraph_extraction_and_pagerank(spark):
    from pdf_parser_spark.operators import linkgraph as lg

    # href extraction: anchors + an off-site link (dst NULL)
    pages = spark.createDataFrame(
        [(1, '<a href="https://nodeX/doc/7">x</a><a href="https://other.org/page">y</a>')],
        "doc_id long, html string",
    )
    links = lg.extract_outlinks(pages).collect()
    assert [(r["src"], r["dst"]) for r in links] == [(1, 7), (1, None)]  # ordered by href

    # star graph: everyone links to node 0 (and 0 links to 1) -> 0 ranks highest;
    # nodes with no inlinks sit at exactly BASE after the first iteration
    docs = _docs(spark, [(i, "t", "en", "s", 1) for i in range(4)])
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (0, 1)], "src long, dst long"
    )
    ranks = {r["doc_id"]: r["rank"] for r in lg.pagerank(docs, edges, iterations=3).collect()}
    assert ranks[0] == max(ranks.values())
    assert ranks[2] == lg.BASE and ranks[3] == lg.BASE  # no inlinks
    # exact-integer determinism: re-run is identical
    again = {r["doc_id"]: r["rank"] for r in lg.pagerank(docs, edges, iterations=3).collect()}
    assert again == ranks


def test_snapshot_diff_four_verdicts(spark):
    from pdf_parser_spark.operators.snapshot import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, fp string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C2"), (4, "d")], "doc_id long, fp string"
    )
    out = {r["doc_id"]: r["change"] for r in snapshot_diff(old, new).collect()}
    assert out == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_domain_quota_caps_per_registered_domain(spark):
    from pdf_parser_spark.operators import weburl

    rows = [(i, f"https://sub{i % 2}.big.example.com/p/{i}") for i in range(8)]
    rows += [(100, "https://small.org/x")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = weburl.domain_quota(df, per_domain=3).collect()
    by_dom: dict = {}
    for r in out:
        by_dom.setdefault(r["reg_domain"], []).append(r["doc_id"])
    # both sub0/sub1 hosts share the big.example.com registered domain
    assert sorted(by_dom["big.example.com"]) == [0, 1, 2]  # capped at 3, smallest ids
    assert by_dom["small.org"] == [100]


def test_line_dedup_drops_shared_lines_and_pins_bytes(spark):
    # doc 1/2 share 'nav bar' and 'footer'; each has a unique body line;
    # doc 3 is ALL shared lines -> everything dropped, md5('') sentinel
    rows = [
        (1, "nav bar\nalpha body one\nfooter"),
        (2, "nav bar\nbeta body two\nfooter"),
        (3, "nav bar\nfooter"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text_multi string")
    out = {r["doc_id"]: r for r in curation.line_dedup(df).collect()}
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 1)
    assert out[1]["clean_md5"] == hashlib.md5(b"alpha body one").hexdigest()
    assert out[2]["clean_md5"] == hashlib.md5(b"beta body two").hexdigest()
    assert (out[3]["n_kept"], out[3]["clean_md5"]) == (
        0, hashlib.md5(b"").hexdigest()
    )
    # shuffle-join scale path is result-identical to the broadcast path
    out2 = {
        r["doc_id"]: r
        for r in curation.line_dedup(df, broadcast_hot=False).collect()
    }
    assert {k: (v["n_kept"], v["clean_md5"]) for k, v in out.items()} == {
        k: (v["n_kept"], v["clean_md5"]) for k, v in out2.items()
    }
    # order preservation: kept lines re-join in original order
    df2 = spark.createDataFrame(
        [(1, "z last\na first\nshared"), (2, "shared")],
        "doc_id long, text_multi string",
    )
    r1 = curation.line_dedup(df2).where("doc_id = 1").collect()[0]
    assert r1["clean_md5"] == hashlib.md5(b"z last\na first").hexdigest()


def test_line_dedup_host_scope_protects_cross_host_lines(spark):
    # 'common idiom' appears once per host on FOUR hosts: global df=4 kills
    # it at min_df=2, but within any single host df=1 — host scope keeps it.
    # 'chrome' saturates host a (df=2 there) -> dropped under BOTH scopes.
    rows = [
        (1, "a", "chrome\ncommon idiom\nbody one"),
        (2, "a", "chrome\nbody two"),
        (3, "b", "common idiom\nbody three"),
        (4, "c", "common idiom\nbody four"),
        (5, "d", "common idiom\nbody five"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text_multi string")
    glob = {r["doc_id"]: r for r in curation.line_dedup(df).collect()}
    host = {
        r["doc_id"]: r
        for r in curation.line_dedup(df, scope_col="source").collect()
    }
    # global: 'common idiom' (df=4) and 'chrome' (df=2) both die
    assert glob[1]["clean_md5"] == hashlib.md5(b"body one").hexdigest()
    assert glob[3]["clean_md5"] == hashlib.md5(b"body three").hexdigest()
    # host scope: 'chrome' still dies on host a, 'common idiom' SURVIVES
    assert host[1]["clean_md5"] == hashlib.md5(
        b"common idiom\nbody one").hexdigest()
    assert (host[1]["n_lines"], host[1]["n_kept"]) == (3, 2)
    assert host[2]["clean_md5"] == hashlib.md5(b"body two").hexdigest()
    assert host[3]["clean_md5"] == hashlib.md5(
        b"common idiom\nbody three").hexdigest()
    # shuffle-join path identical under scope too
    host2 = {
        r["doc_id"]: (r["n_kept"], r["clean_md5"])
        for r in curation.line_dedup(
            df, scope_col="source", broadcast_hot=False).collect()
    }
    assert host2 == {k: (v["n_kept"], v["clean_md5"]) for k, v in host.items()}


def test_anchor_text_index_sorted_distinct(spark):
    from pdf_parser_spark.operators import linkgraph as lg

    pages = spark.createDataFrame(
        [
            (1, '<a href="https://n/doc/7">zeta</a><a href="https://n/doc/7">alpha</a>'
                '<a href="https://n/doc/9">mid</a><a href="https://off.site/x">out</a>'),
            (2, '<a href="https://n/doc/7">alpha</a>'),
        ],
        "doc_id long, html string",
    )
    out = {r["dst"]: r for r in lg.anchor_text_index(pages).collect()}
    assert set(out) == {7, 9}  # off-site link (no /doc/<id>) excluded
    assert (out[7]["n_inlinks"], out[7]["n_srcs"]) == (3, 2)
    assert out[7]["texts"] == "alpha|zeta"  # distinct + sorted
    assert (out[9]["n_inlinks"], out[9]["texts"]) == (1, "mid")


def test_head_meta_extracts_fields_and_blank_on_missing(spark):
    from pdf_parser_spark.operators import htmlmeta as hm

    pages = spark.createDataFrame(
        [
            (1, '<html><head><meta charset="utf-8"><title>Hello World</title>'
                '<meta name="description" content="a desc">'
                '<link rel="canonical" href="https://x.example.com/doc/1">'
                '<meta property="og:title" content="HELLO"></head><body></body></html>'),
            (2, "<html><head><title>Only Title</title></head><body></body></html>"),
        ],
        "doc_id long, html string",
    )
    out = {r["doc_id"]: r for r in hm.head_meta(pages).collect()}
    assert out[1]["title"] == "Hello World"
    assert out[1]["charset"] == "utf-8"
    assert out[1]["description"] == "a desc"
    assert out[1]["canonical"] == "https://x.example.com/doc/1"
    assert out[1]["og_title"] == "HELLO"
    assert out[2]["title"] == "Only Title"
    assert (
        out[2]["charset"], out[2]["description"],
        out[2]["canonical"], out[2]["og_title"],
    ) == ("", "", "", "")
    # synthesized head round-trips through extraction (field parity with
    # the formulas the oracle re-derives)
    docs = _docs(spark, [(0, "w1 w2 w3 w4 w5 w6 w7 w8 w9", "en", "src", 1)])
    r = hm.head_meta(hm.with_head_html(docs)).collect()[0]
    assert r["title"] == "w1 w2 w3 w4 w5"
    assert r["description"] == "w1 w2 w3 w4 w5 w6 w7 w8"
    assert r["canonical"] == ""  # doc_id%3==0 omits canonical
    assert r["og_title"] == "W1 W2 W3 W4 W5"


def test_scd2_history_segments_on_change_and_gap(spark):
    from pdf_parser_spark.operators.snapshot import scd2_history

    rows = [
        # doc 1: fp changes at ts=2 -> two segments, second current
        (1, 0, "A"), (1, 1, "A"), (1, 2, "B"), (1, 3, "B"),
        # doc 2: absent at ts=2 -> gap splits SAME fp into two segments
        (2, 0, "C"), (2, 1, "C"), (2, 3, "C"),
        # doc 3: dropped before the end -> nothing current
        (3, 0, "D"), (3, 1, "D"),
    ]
    snaps = spark.createDataFrame(rows, "doc_id long, snap_ts long, fp string")
    out = [
        (r["doc_id"], r["valid_from"], r["valid_to"], r["fp"], r["is_current"])
        for r in scd2_history(snaps, k=4).collect()
    ]
    assert out == [
        (1, 0, 1, "A", False), (1, 2, 3, "B", True),
        (2, 0, 1, "C", False), (2, 3, 3, "C", True),
        (3, 0, 1, "D", False),
    ]


def test_quality_tiers_value_quantile_binning(spark):
    # 3x0.9, 4x0.5, 3x0.1 with 2 tiers: cum_before 0/3/7 of 10 ->
    # tiers 0/0/1; every doc sharing a value shares its tier
    rows = [(i, 0.9) for i in range(3)] + [(i, 0.5) for i in range(3, 7)] \
        + [(i, 0.1) for i in range(7, 10)]
    scored = spark.createDataFrame(rows, "doc_id long, quality double")
    out = {r["doc_id"]: r["tier"] for r in
           curation.quality_tiers(scored, n_tiers=2).collect()}
    assert [out[i] for i in range(10)] == [0, 0, 0, 0, 0, 0, 0, 1, 1, 1]
    # 10 tiers over 10 distinct values -> one value per tier, best = tier 0
    rows2 = [(i, i / 10.0) for i in range(10)]
    scored2 = spark.createDataFrame(rows2, "doc_id long, quality double")
    out2 = {r["doc_id"]: r["tier"] for r in
            curation.quality_tiers(scored2, n_tiers=10).collect()}
    assert out2 == {i: 9 - i for i in range(10)}


def test_vocab_growth_heaps_curve(spark):
    """Exact hand curve at K=4 over dense ids (bucket = doc_id + 1): token
    cumsum counts case-sensitively-split tokens, vocabulary counts
    LOWERCASED first-seen types (the 'B' in d2 is not a new type), an
    empty bucket rides through as a flat step, and on the real corpus the
    curve is monotone with exact endpoints."""
    from pdf_parser_spark.operators import textstats as T

    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "b c"), (2, "b B b"), (3, "a d d")],
        "doc_id long, text string",
    )
    got = [(r["ckpt"], r["n_docs"], r["n_tokens"], r["vocab"])
           for r in T.vocab_growth(docs, n_checkpoints=4).collect()]
    assert got == [(1, 1, 3, 2), (2, 2, 5, 3), (3, 3, 8, 3), (4, 4, 11, 4)]

    real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    curve = T.vocab_growth(real).collect()
    assert len(curve) == T.VG_CHECKPOINTS
    for a, b in zip(curve, curve[1:]):
        assert (a["n_docs"] <= b["n_docs"] and a["n_tokens"] <= b["n_tokens"]
                and a["vocab"] <= b["vocab"])
    # exact endpoints: the last step IS the corpus
    from pyspark.sql import functions as F  # noqa: N812
    from pdf_parser_spark.functions import words
    last = curve[-1]
    assert last["n_docs"] == real.count()
    totals = real.select(
        F.explode(words(F.lower(F.col("text")))).alias("t")).agg(
        F.count("*").alias("nt"), F.countDistinct("t").alias("nv")).first()
    assert last["n_tokens"] == totals["nt"]
    assert last["vocab"] == totals["nv"]


def test_top_terms_rank_tiebreak_and_floor(spark):
    from pdf_parser_spark.operators import textstats

    docs = _docs(spark, [
        (1, "aa bb aa cc", "en", "s", 1),
        (2, "bb aa once", "en", "s", 1),
        (3, "xx xx", "de", "s", 1),
    ])
    out = [(r["lang"], r["term"], r["cnt"], r["rank"])
           for r in textstats.top_terms(docs, k=2).collect()]
    # en: aa(3) first; bb(2) second; cc/once fall under min_count=2
    assert out == [("de", "xx", 2, 1), ("en", "aa", 3, 1), ("en", "bb", 2, 2)]
    # tie-break: equal counts rank alphabetically
    docs2 = _docs(spark, [(1, "zz aa zz aa", "en", "s", 1)])
    out2 = [(r["term"], r["rank"]) for r in textstats.top_terms(docs2).collect()]
    assert out2 == [("aa", 1), ("zz", 2)]


def test_dehyphenate_join_rule_and_count(spark):
    import hashlib as _h

    docs = _docs(spark, [
        (0, "a compa-\nny and broad-\ncasting", "en", "s", 1),  # two joins
        (1, "Wi-\nFi stays", "en", "s", 1),       # capital after wrap: keep
        (2, "pre-\n existing", "en", "s", 1),     # space after \n: keep
        (3, "x-\ny-\nz", "en", "s", 1),           # chain: left-to-right pass
        (4, "clean text", "en", "s", 1),
    ])
    out = {r["doc_id"]: r for r in curation.dehyphenate(docs).collect()}
    exp = {
        0: ("a company and broadcasting", 2),
        1: ("Wi-\nFi stays", 0),
        2: ("pre-\n existing", 0),
        # non-overlapping scan joins x-\ny, then resumes AFTER y: the
        # second wrap survives the single pass
        3: ("xy-\nz", 1),
        4: ("clean text", 0),
    }
    for d, (txt, n) in exp.items():
        assert out[d]["n_joins"] == n, d
        assert out[d]["text_md5"] == _h.md5(txt.encode()).hexdigest(), d
    # synthesis buckets: %4==1 two joins, %4==2 is the pure negative
    # control (both wraps continue uppercase), %4==3 one join
    wrapped = curation.with_hyphen_wraps(_docs(spark, [
        (i, "base", "en", "s", 1) for i in (1, 2, 3, 4)]))
    n = {r["doc_id"]: r["n_joins"] for r in
         curation.dehyphenate(wrapped).collect()}
    assert n == {1: 2, 2: 0, 3: 1, 4: 0}


def test_top_terms_two_phase_equals_single_window(spark):
    from pdf_parser_spark.operators import textstats

    # tie-heavy boundary: 40 en terms all count 2 — the k=10 cut runs
    # entirely on the alphabetical tie-break, where salt leakage or a
    # phase-order bug would pick a different (still count-2) winner set
    terms = [f"t{i:02d}" for i in range(40)]
    docs = _docs(spark, [
        (i, " ".join(terms), "en", "s", 1) for i in range(2)
    ] + [(100, "aa bb aa bb cc", "de", "s", 1),
         (101, "aa cc", "de", "s", 1)])
    one = [(r["lang"], r["term"], r["cnt"], r["rank"])
           for r in textstats.top_terms(docs).collect()]
    two = [(r["lang"], r["term"], r["cnt"], r["rank"])
           for r in textstats.top_terms_two_phase(docs).collect()]
    assert one == two
    assert [t for l, t, c, r in two if l == "en"] == terms[:10]
    # and on the real table, including a degenerate 1-way salt
    real = spark.read.parquet(f"{SF001}/documents.parquet")
    base = [(r["lang"], r["term"], r["cnt"], r["rank"])
            for r in textstats.top_terms(real).collect()]
    for n_salt in (1, 16):
        got = [(r["lang"], r["term"], r["cnt"], r["rank"])
               for r in textstats.top_terms_two_phase(
                   real, n_salt=n_salt).collect()]
        assert got == base


def test_pmi_collocations_exact_ppm_and_gates(spark):
    from pdf_parser_spark.operators import textstats

    docs = _docs(spark, [
        (1, "los angeles is big", "en", "s", 1),
        (2, "los angeles is big", "en", "s", 1),
        (3, "los angeles is big", "en", "s", 1),
        (4, "the the the the the the", "en", "s", 1),
        (5, "solo", "en", "s", 1),                 # no bigram, 1 token in N
        (6, "rare pair rare pair", "en", "s", 1),  # count 2 < min_count 3
    ])
    out = [(r["w1"], r["w2"], r["c_xy"], r["pmi_ppm"], r["rank"])
           for r in textstats.pmi_collocations(docs).collect()]
    # N = 23 tokens; the bound pairs: ppm = 10^6 * 3 * 23 / (3*3) = 7666666
    # (exact floor); (the,the): 10^6 * 5 * 23 / 36 = 3194444.
    # The 3 equal-ppm pairs tie-break w1 asc.
    assert out == [
        ("angeles", "is", 3, 7666666, 1),
        ("is", "big", 3, 7666666, 2),
        ("los", "angeles", 3, 7666666, 3),
        ("the", "the", 5, 3194444, 4),
    ]
    # PMI ranks the bound pair ABOVE the more frequent stopword bigram
    assert out[0][3] > out[3][3] and out[3][2] > out[0][2]
    # k truncates: the top row is stable under a smaller k
    top1 = textstats.pmi_collocations(docs, k=1).collect()
    assert [(r["w1"], r["w2"], r["rank"]) for r in top1] == [
        ("angeles", "is", 1)]


def test_frontier_schedule_invariants(spark):
    from pdf_parser_spark.operators import linkgraph as lg

    docs = _docs(
        spark,
        [(i, f"word{i} text body sample", "en", f"s{i % 4}", 1) for i in range(30)],
    )
    rows = lg.frontier_schedule(docs, per_domain=3, iterations=2).collect()
    assert rows  # composition yields a non-empty frontier
    by_host, by_dom = {}, {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
        by_dom.setdefault(r["reg_domain"], []).append(r)
        assert r["fetch_at_ms"] == (r["fetch_slot"] - 1) * (len(r["host"]) % 5) * 100
    for host, hr in by_host.items():
        slots = sorted(x["fetch_slot"] for x in hr)
        assert slots == list(range(1, len(hr) + 1))  # dense per-host queue
        # queue ordered by rank desc then doc_id
        ordered = sorted(hr, key=lambda x: (-x["rank"], x["doc_id"]))
        assert [x["fetch_slot"] for x in ordered] == list(range(1, len(hr) + 1))
    assert all(len(v) <= 3 for v in by_dom.values())  # quota respected


def test_parse_robots_rfc_group_semantics(spark):
    from pdf_parser_spark.operators import weburl

    txt1 = ("# comment\n"
            "User-agent: FooBot\n"
            "Disallow: /private/\n"
            "\n"
            "user-agent: a\n"
            "USER-AGENT: *\n"          # multi-agent run = ONE group
            "disallow: /x/\n"
            "Crawl-delay: 0.3\n")
    txt2 = ("User-agent: FooBot\nDisallow: /all/\n")   # no '*' group
    txt3 = ("User-agent: *\nDisallow:\n")              # empty = allow-all
    robots = spark.createDataFrame(
        [("h1", txt1), ("h2", txt2), ("h3", txt3)], "host string, robots_txt string"
    )
    out = {r["host"]: r for r in weburl.parse_robots(robots).collect()}
    assert out["h1"]["disallow_prefix"] == "/x/"        # FooBot group skipped
    assert out["h1"]["crawl_delay_ms"] == 300           # fractional secs -> ms
    assert out["h2"]["disallow_prefix"] is None and out["h2"]["crawl_delay_ms"] == 0
    assert out["h3"]["disallow_prefix"] is None         # empty Disallow dropped
    # parsed synthetic dim == formula dim robots_filter consumes
    hosts = spark.createDataFrame(
        [(h,) for h in ("ab.example.com", "news.xyz.io", "x.co")], "host string"
    )
    parsed = {r["host"]: r for r in weburl.parse_robots(
        weburl.with_robots_txt(hosts)).collect()}
    formula = {r["host"]: r for r in weburl.robots_rules(
        hosts.withColumn("canonical_url", F.lit(""))).collect()}
    for h in parsed:
        assert parsed[h]["disallow_prefix"] == formula[h]["disallow_prefix"], h
        assert parsed[h]["crawl_delay_ms"] == formula[h]["crawl_delay_ms"], h


def test_parse_sitemap_pairs_and_rank(spark):
    from pdf_parser_spark.operators import weburl

    xml = ('<?xml version="1.0"?><urlset>'
           '<url><loc>https://h/a</loc><lastmod>2024-01-01</lastmod></url>'
           '<url><loc>https://h/b</loc><lastmod>2024-03-01</lastmod></url>'
           '<url><loc>https://h/c</loc><lastmod>2024-03-01</lastmod></url>'
           '</urlset>')
    sm = spark.createDataFrame([("h", xml)], "host string, sitemap_xml string")
    out = [(r["loc"], r["lastmod"], r["recrawl_rank"])
           for r in weburl.parse_sitemap(sm).collect()]
    # freshest first; lastmod tie broken by loc asc; stale page last
    assert out == [
        ("https://h/b", "2024-03-01", 1),
        ("https://h/c", "2024-03-01", 2),
        ("https://h/a", "2024-01-01", 3),
    ]


def test_align_rollup_overlap_weights(spark, tmp_path, monkeypatch):
    """GeoAlign redistribution: a 45-min bucket straddling two hours splits
    its count by overlap seconds (900/1800 for source bucket [2700,5400))."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_spark.plans.relational import a_align_rollup

    # 2 events in src bucket 1 = [2700, 5400): overlaps hour 0 by 900 s and
    # hour 1 by 1800 s -> weighted 2*900 / 2*1800
    sf = tmp_path / "sf"
    sf.mkdir()
    ts = [3000 * 1_000_000, 5000 * 1_000_000]  # epoch us
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1], pa.int64()),
        "event_type": pa.array(["a", "a"], pa.string()),
        "value": pa.array([0.0, 0.0], pa.float64()),
        "props": pa.array([None, None], pa.string()),
    }), str(sf / "events.parquet"))
    out = {r["window_start"]: r["weighted_num"]
           for r in a_align_rollup(spark, str(sf)).collect()}
    assert out == {0: 2 * 900, 3600: 2 * 1800}


def test_containment_catches_excerpt_jaccard_misses(spark):
    from pdf_parser_spark.operators import dedup

    body = " ".join(f"w{i}" for i in range(60))
    excerpt = "quoted: " + " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, "s", body), (2, "s", excerpt), (3, "s", "totally different text here")],
        "doc_id long, source string, text string",
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["containment_bp"]
             for r in dedup.containment_pairs(docs, threshold_bp=8000).collect()}
    # excerpt contained in body (18 of 19 shingles shared -> 9473bp)...
    assert pairs == {(2, 1): 9473}
    # ...while Jaccard on the same pair is far below any useful threshold
    jac = dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert jac == []


def test_hits_star_graph(spark):
    """Star graph: everyone links to node 0 -> node 0 is the authority,
    the pointers are the hubs; deterministic integer re-run."""
    from pdf_parser_spark.operators import linkgraph as lg

    docs = _docs(spark, [(i, "t", "en", "s", 1) for i in range(4)])
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0)], "src long, dst long"
    )
    out = {r["doc_id"]: (r["hub"], r["authority"])
           for r in lg.hits(docs, edges, iterations=2).collect()}
    assert out[0][1] == max(a for _, a in out.values())   # top authority
    assert out[0][0] == 0                                  # no out-edges
    assert out[1] == out[2] == out[3]                      # symmetric hubs
    assert out[1][0] > 0 and out[1][1] == 0
    again = {r["doc_id"]: (r["hub"], r["authority"])
             for r in lg.hits(docs, edges, iterations=2).collect()}
    assert again == out


def test_cocitation_and_graph_stats(spark):
    from pdf_parser_spark.operators import linkgraph as lg

    # src 1 and 2 both cite {10, 11}; src 3 cites 10 only; 10<->11 reciprocal
    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10), (10, 11), (11, 10)],
        "src long, dst long",
    )
    cc = {(r["dst_a"], r["dst_b"]): r["n_cociting"]
          for r in lg.cocitation_pairs(edges, min_count=2).collect()}
    assert cc == {(10, 11): 2}  # only the pair co-cited by >= 2 sources
    st = lg.graph_stats(edges).collect()[0]
    assert (st["n_edges"], st["n_srcs"], st["n_dsts"]) == (7, 5, 2)
    assert (st["max_outdeg"], st["max_indeg"]) == (2, 4)
    assert st["n_reciprocal"] == 2  # 10->11 and 11->10


def test_seed_distance_bfs_depths(spark):
    from pdf_parser_spark.operators import linkgraph as lg

    # seeds are doc_id % 17 == 0 -> {0, 17}; chain 0->1->2->3; 17->3 gives
    # 3 a SHORTER path (1) than via the chain (3); 4..10 a deep tail
    docs = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 17, 99)],
        "doc_id long",
    )
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (17, 3)]
        + [(i, i + 1) for i in range(3, 10)],  # 3->4->...->10
        "src long, dst long",
    )
    out = {r["doc_id"]: r["depth"] for r in
           lg.seed_distance(docs, edges).collect()}
    # min over paths: 3 via the seed 17 shortcut, not the 3-hop chain
    assert out[0] == 0 and out[17] == 0
    assert out[1] == 1 and out[2] == 2 and out[3] == 1
    # the tail walks 3(d1)->4(d2)->...->8(d6); 9 needs 7 hops: outside
    # the max_hops=6 horizon, like the isolated 99
    assert out[8] == 6
    assert 9 not in out and 10 not in out and 99 not in out
    # widening the horizon reaches the tail end
    out9 = {r["doc_id"]: r["depth"] for r in
            lg.seed_distance(docs, edges, max_hops=8).collect()}
    assert out9[9] == 7 and out9[10] == 8


def test_host_graph_compression_semantics(spark):
    from pdf_parser_spark.operators import linkgraph as lg

    # docs 1,2,3 live on host A; 10,11 on B; 20 on C
    urls = spark.createDataFrame(
        [(1, "a.com"), (2, "a.com"), (3, "a.com"),
         (10, "b.com"), (11, "b.com"), (20, "c.com")],
        "doc_id long, host string",
    )
    edges = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 11),   # hub page 1: duplicate link to 10
         (2, 10),                     # second distinct A-page linking B
         (1, 2), (3, 3),              # intra-host + true self-loop: dropped
         (10, 20)],
        "src long, dst long",
    )
    out = {(r["src_host"], r["dst_host"]): r for r in
           lg.host_graph(edges, urls).collect()}
    assert set(out) == {("a.com", "b.com"), ("b.com", "c.com")}
    ab = out[("a.com", "b.com")]
    # 4 page edges but only 2 DISTINCT linking pages — the hub page's
    # duplicate link cannot fake a third endorser
    assert ab["n_links"] == 4 and ab["n_src_pages"] == 2
    assert out[("b.com", "c.com")]["n_links"] == 1


def test_ngram_novelty_is_ordered_and_graded(spark):
    """Novelty pins: the first doc is 100% novel; an exact duplicate later
    is 0% novel (same bytes, zero marginal value — the 'marginal' in the
    docstring); a half-overlapping doc lands in between with exact bp; and
    the duplicate placed FIRST would have been the novel one (order rides
    on min(doc_id))."""
    from pdf_parser_spark.operators import textstats as T

    a = "one two three four five six"
    half = "four five six seven eight nine"       # shares the tail shingles
    docs = spark.createDataFrame(
        [(0, a), (1, a), (2, half)], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty_bp"])
           for r in T.ngram_novelty(docs).collect()}
    assert got[0] == (4, 4, 10000)
    assert got[1] == (4, 0, 0)
    # half: shingles of 'four five six seven eight nine' -> 4 windows, of
    # which 'four five six' already appeared in doc 0 -> 3 novel
    assert got[2] == (4, 3, 7500)


def test_length_quantiles_approx_bands_against_exact(spark):
    """The GK sketch face must land every quantile inside the exact op's
    value RANGE per source (sketch error moves ranks, so the reported
    value must be a value the source actually has, between the exact p25
    and p99 for inner quantiles — a loose but engine-portable band)."""
    from pdf_parser_spark.operators import textstats as T

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    exact = {r["source"]: r for r in T.length_quantiles(docs).collect()}
    approx = {r["source"]: r for r in T.length_quantiles_approx(docs).collect()}
    assert set(exact) == set(approx)
    for src, a in approx.items():
        e = exact[src]
        assert a["n_docs"] == e["n_docs"]
        # monotone and inside the exact envelope
        assert a["p25"] <= a["p50"] <= a["p75"] <= a["p90"] <= a["p99"]
        assert e["p25"] * 0.5 <= a["p25"] <= e["p50"]
        assert e["p25"] <= a["p50"] <= e["p75"]
        assert e["p50"] <= a["p75"] <= e["p90"]
        assert e["p75"] <= a["p90"] <= e["p99"]
        assert a["p99"] >= e["p90"]


def test_release_headline_composes_live_operators(spark):
    """Headline pins: the one-row summary equals hand-composed per-doc
    operator outputs (gate pass rate, exact-dup rate from duplicate texts,
    lang count, mean quality in bp) — and because it CALLS quality_gate /
    quality_score, a threshold change there moves the headline too."""
    from pdf_parser_spark.operators import curation as C
    from pdf_parser_spark.operators.textstats import quality_gate, quality_score

    passing = ("the quick brown fox is of a kind seen on and with many "
               "others in the field for a while now ") * 3
    docs = spark.createDataFrame(
        [(0, passing, "en"), (1, passing, "en"),       # exact dup pair
         (2, "short", "en"), (3, "xx yy zz " * 30, "fr")],
        "doc_id long, text string, lang string",
    )
    r = C.release_headline(docs).collect()[0]
    gates = {g["doc_id"]: g["passed"] for g in quality_gate(docs).collect()}
    quals = {q["doc_id"]: round(q["quality"] * 10000)
             for q in quality_score(docs).collect()}
    assert r["n_docs"] == 4 and r["n_langs"] == 2
    assert r["n_distinct_texts"] == 3 and r["dup_bp"] == 2500
    assert r["gate_pass_bp"] == (10000 * sum(gates.values())) // 4
    assert r["mean_quality_bp"] == sum(quals.values()) // 4


def test_tokenizer_fertility_and_reciprocity(spark):
    """Fertility pins: exact run/word/char arithmetic per lang and the
    integer-bp ratios; reciprocity pins: a mutual host pair counts both
    directions, a one-way link neither, page-edge multiplicity folds."""
    from pdf_parser_spark.operators import linkgraph as lg
    from pdf_parser_spark.operators import textstats as T

    docs = spark.createDataFrame(
        [(0, "ab cd", "en"), (1, "a1-b", "en"), (2, "xyz", "fr")],
        "doc_id long, text string, lang string",
    )
    got = {r["lang"]: (r["n_docs"], r["n_words"], r["n_pretokens"],
                       r["n_chars"], r["fertility_bp"],
                       r["chars_per_pretoken_bp"])
           for r in T.tokenizer_fertility(docs).collect()}
    # en: words 2+1=3; pretokens (ab,cd) + (a,1,-,b) = 6; chars 5+4=9
    assert got["en"] == (2, 3, 6, 9, 20000, 15000)
    assert got["fr"] == (1, 1, 1, 3, 10000, 30000)

    urls = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "doc_id long, host string")
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 0), (0, 2)], "src long, dst long")
    r = lg.graph_reciprocity(edges, urls).collect()[0]
    assert (r["n_edges"], r["n_reciprocated"], r["reciprocity_bp"]) == \
        (3, 2, 6666)


def test_bigram_surprisal_backoff_table(spark):
    """Exact integer-bits pins for the bigram LM (ref doc 0 'a b a b c':
    N=5, V=3; ubits a/b=1, c=2, OOV=3; bbits (a,b)=0, (b,a)=(b,c)=1) and
    the motivating inversion: 'the the the' is fluent under unigrams but
    garbage under bigrams — the bigram op must rank it ABOVE the fluent
    doc in surprisal where the unigram op ranks it at or below."""
    from pdf_parser_spark.operators import textstats as T

    docs = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a b x")], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_toks"], r["n_bigram_hits"], r["bits_sum"],
                         r["mean_cb"])
           for r in T.lm_surprisal2(docs).collect()}
    # doc 0: first 'a'=1; (a,b)=0, (b,a)=1, (a,b)=0, (b,c)=1 -> sum 3
    assert got[0] == (5, 4, 3, 60)
    # doc 1: first 'a'=1; (a,b)=0 hit; (b,x) miss, x OOV -> 2 + 3 = 5
    assert got[1] == (3, 1, 6, 200)

    docs2 = spark.createDataFrame(
        [(0, "the cat sat on the mat"),
         (1, "the cat sat"),
         (2, "the the the")],
        "doc_id long, text string")
    bi = {r["doc_id"]: r["mean_cb"] for r in T.lm_surprisal2(docs2).collect()}
    uni = {r["doc_id"]: r["mean_cb"] for r in T.lm_surprisal(docs2).collect()}
    assert bi[2] > bi[1]      # bigram: repetition is surprising
    assert uni[2] <= uni[1]   # unigram: repetition of 'the' looks fluent


def test_cdc_chunks_resync_and_invariants(spark):
    """CDC pins: chunks tile each document contiguously with length in
    (0, MAX] and every non-tail chunk >= MIN; md5s are the chunk bytes;
    and the REASON the operator exists — after a single insertion the
    boundaries re-synchronize, so the edited document shares most chunks
    with the original (fixed-size chunking would share none after the
    edit point)."""
    import hashlib

    from pdf_parser_spark.operators import dedup as D

    base = ("the quick brown fox jumps over the lazy dog while seventeen "
            "crawlers index forty two pages of boilerplate navigation and "
            "one paragraph of actual content worth keeping for training")
    edited = base[:60] + "XYZ" + base[60:]
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string")
    rows = sorted(
        ((r["doc_id"], r["chunk_idx"], r["start"], r["length"],
          r["chunk_md5"], r["n_copies"])
         for r in D.cdc_chunks(docs).collect()))
    by_doc: dict[int, list] = {1: [], 2: []}
    for r in rows:
        by_doc[r[0]].append(r)
    for did, text in ((1, base), (2, edited)):
        cs = by_doc[did]
        pos = 0
        for i, (_, idx, start, length, md5h, _n) in enumerate(cs):
            assert idx == i and start == pos and 0 < length <= D.CDC_MAX
            if i < len(cs) - 1:
                assert length >= D.CDC_MIN
            assert md5h == hashlib.md5(
                text[start:start + length].encode()).hexdigest()
            pos += length
        assert pos == len(text)
    # re-sync: strictly more than half of the original's chunks also
    # appear in the edited doc (n_copies == 2)
    shared = sum(1 for r in by_doc[1] if r[5] == 2)
    assert shared > len(by_doc[1]) // 2


def test_param_audit_distinct_ratio(spark):
    """Param-mining pins: a per-url-unique session param is flagged, a
    constant param and a low-cardinality paginator are not, the min_urls
    floor suppresses rare keys, the value is everything after the LAST
    '=' (v=a=b counts 'b'), and bp division is exact."""
    from pdf_parser_spark.operators import weburl as W

    rows = [(i, f"http://h/p?sid={i}&page={i % 2}&site=main") for i in range(20)]
    rows += [(100, "http://h/p?rare=x&v=a=b"), (101, "http://h/p?rare=y")]
    docs = spark.range(0).toDF("doc_id")  # unused (urls passed explicitly)
    urls = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["param"]: (r["n_urls"], r["n_distinct_values"],
                        r["distinct_bp"], r["tracking_suspect"])
           for r in W.param_audit(docs, urls=urls).collect()}
    assert got["sid"] == (20, 20, 10000, True)
    assert got["page"] == (20, 2, 1000, False)
    assert got["site"] == (20, 1, 500, False)
    assert got["rare"] == (2, 2, 10000, False)   # below min_urls
    assert got["v"] == (1, 1, 10000, False)      # 'a=b' -> value 'b' parsed


def test_minhash_estimate_audit(spark):
    """Sketch-audit pins: identical docs agree on every signature lane
    (est = exact = 10000, err 0); on the real corpus every row's err_bp is
    exactly est - exact, estimates quantize to multiples of 10000/k, and
    the pair set equals the band-candidate set."""
    from pdf_parser_spark.operators import dedup as D

    dup = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "totally different words here entirely now")],
        "doc_id long, text string",
    )
    rows = {(r["doc_a"], r["doc_b"]): r
            for r in D.minhash_estimate_audit(dup).collect()}
    assert (1, 2) in rows
    r = rows[(1, 2)]
    assert (r["agree_k"], r["est_bp"], r["exact_bp"], r["err_bp"]) == \
        (len(D.MINHASH_PARAMS), 10000, 10000, 0)

    real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    audit = D.minhash_estimate_audit(real).collect()
    k = len(D.MINHASH_PARAMS)
    assert {(r["doc_a"], r["doc_b"]) for r in audit} == {
        (r["doc_a"], r["doc_b"])
        for r in D._band_candidates(real, 3).collect()}
    for r in audit:
        assert 0 <= r["est_bp"] <= 10000 and 0 <= r["exact_bp"] <= 10000
        assert r["err_bp"] == r["est_bp"] - r["exact_bp"]
        assert r["est_bp"] == (10000 * r["agree_k"]) // k


def test_robots_wildcard_decision_table(spark):
    """Wildcard-grammar pins: '*' spans any run, trailing '$' anchors at
    path end, a LONGER wildcard Allow overrides the shorter Disallow,
    regex metas in patterns stay literal ('/x+y/' must not behave as
    x-plus), and the no-match default is allowed with match_len 0."""
    from pdf_parser_spark.operators import weburl as W

    rules = spark.createDataFrame(
        [("h", "disallow", "/docs/"),
         ("h", "allow", "/docs/*1"),
         ("h", "disallow", "/a/*7$"),
         ("h", "disallow", "/x+y/")],
        "host string, kind string, prefix string",
    )
    urls = spark.createDataFrame(
        [(0, "h", "https://h/docs/29"),   # /docs/, no '1' -> blocked (6)
         (1, "h", "https://h/docs/21"),   # allow /docs/*1 wins at len 8
         (2, "h", "https://h/a/b/17"),    # ends in 7 -> $-anchored block
         (3, "h", "https://h/a/b/71"),    # ends in 1 -> nothing matches
         (4, "h", "https://h/x+y/z"),     # literal + -> blocked
         (5, "h", "https://h/xxy/z")],    # would match only if + were regex
        "doc_id long, host string, canonical_url string",
    )
    got = {r["doc_id"]: (r["allowed"], r["match_kind"], r["match_len"])
           for r in W.robots_decision_wildcard(urls, rules).collect()}
    assert got == {
        0: (False, "disallow", 6),
        1: (True, "allow", 8),
        2: (False, "disallow", 6),
        3: (True, "", 0),
        4: (False, "disallow", 5),   # '/x+y/' is 5 octets
        5: (True, "", 0),
    }


def test_degree_distribution_log2_bins(spark):
    """Degree histogram pins: a 5-out-host lands in bin 2 ([4,7]), three
    1-out-hosts in bin 0, degree counts DISTINCT neighbors (parallel page
    edges fold), and in/out are independent histograms."""
    from pdf_parser_spark.operators import linkgraph as lg

    urls = spark.createDataFrame(
        [(i, f"h{i}") for i in range(7)], "doc_id long, host string")
    edges = spark.createDataFrame(
        # h0 -> h1..h5 (out-degree 5; the duplicate h0->h1 page edge folds)
        [(0, 1), (0, 1), (0, 2), (0, 3), (0, 4), (0, 5),
         # h1, h2, h3 each -> h6 (out-degree 1 each; h6 in-degree 3)
         (1, 6), (2, 6), (3, 6)],
        "src long, dst long",
    )
    got = {(r["direction"], r["bin"]): (r["n_hosts"], r["min_deg"], r["max_deg"])
           for r in lg.degree_distribution(edges, urls).collect()}
    assert got[("out", 2)] == (1, 5, 5)     # h0: deg 5 -> bin 2
    assert got[("out", 0)] == (3, 1, 1)     # h1,h2,h3
    assert got[("in", 1)] == (1, 3, 3)      # h6: in-deg 3 -> bin 1
    # h1..h5 in-degree 1 each -> bin 0 with 5 hosts
    assert got[("in", 0)] == (5, 1, 1)
    assert set(got) == {("out", 2), ("out", 0), ("in", 1), ("in", 0)}


def test_hreflang_clusters_chain_closure_and_negatives(spark):
    """hreflang pins: the per-group declaration CHAIN (1->0, 2->1) closes
    transitively into one 3-member cluster labeled by its min id with
    n_langs counting distinct langs; the %7==0 dangling declaration and
    the rel=stylesheet decoy create no edges; a group-leader with no
    followers is a singleton."""
    from pdf_parser_spark.operators import weburl as W

    docs = spark.createDataFrame(
        [(0, "en", "alpha"), (1, "es", "beta"),
         (2, "fr", "gamma"), (3, "en", "delta")],
        "doc_id long, lang string, source string",
    )
    html = {r["doc_id"]: r["html"]
            for r in W.with_hreflang_html(docs).collect()}
    assert html[1].count('rel="alternate"') == 1
    assert 'hreflang="en"' in html[1]          # target 0's lang rides along
    assert html[0].count('rel="alternate"') == 1   # ONLY the dangling decl
    assert "dangling.invalid" in html[0]
    assert html[3].count('rel="alternate"') == 0   # group leader: none
    assert all('rel="stylesheet"' in h for h in html.values())

    got = {r["doc_id"]: (r["cluster"], r["n_members"], r["n_langs"])
           for r in W.hreflang_clusters(docs).collect()}
    assert got == {
        0: (0, 3, 3), 1: (0, 3, 3), 2: (0, 3, 3),
        3: (3, 1, 1),
    }


def test_bowtie_regions_on_engineered_graph(spark):
    """Broder bow-tie pins on a hand graph: a 2-host cycle is the core
    (pivot = min host a1 sits in it), a host linking INTO the cycle is
    'in', a host the cycle links to is 'out', a tendril hanging off the
    IN set and an isolated host are both 'other'."""
    from pdf_parser_spark.operators import linkgraph as lg

    urls = spark.createDataFrame(
        [(0, "a1"), (1, "a2"), (2, "i1"), (3, "o1"), (4, "t1"), (5, "z")],
        "doc_id long, host string",
    )
    edges = spark.createDataFrame(
        [(0, 1), (1, 0),   # core cycle a1 <-> a2
         (2, 0),           # i1 -> a1   (IN)
         (1, 3),           # a2 -> o1   (OUT)
         (2, 4)],          # i1 -> t1   (tendril off IN: 'other')
        "src long, dst long",
    )
    got = {r["host"]: r["region"] for r in lg.bowtie(edges, urls).collect()}
    assert got == {"a1": "core", "a2": "core", "i1": "in",
                   "o1": "out", "t1": "other", "z": "other"}

    # no inter-host edges at all -> every host is 'other'
    lonely = spark.createDataFrame([(0, 3)], "src long, dst long")
    one_host = spark.createDataFrame(
        [(0, "only"), (3, "only")], "doc_id long, host string")
    got2 = {r["host"]: r["region"]
            for r in lg.bowtie(lonely, one_host).collect()}
    assert got2 == {"only": "other"}


def test_host_communities_weighted_lpa(spark):
    """LPA semantics pins: two 3-host cliques joined by one weak edge
    resolve to two communities (the w=1 bridge never outvotes the w=3
    clique edges); the community label is the (weight desc, label asc)
    argmax chain's fixed point; an isolated host keeps itself; and a
    rounds=1 run proves weight beats label-asc in the vote (q < r but the
    w=3 edge to r wins)."""
    from pdf_parser_spark.operators import linkgraph as lg

    urls = spark.createDataFrame(
        [(0, "a1"), (1, "a2"), (2, "a3"),
         (3, "b1"), (4, "b2"), (5, "b3"), (6, "iso")],
        "doc_id long, host string",
    )
    # page-level multiplicity builds the weights: 3 parallel page edges
    # per intra-clique host pair, one bridge edge a3->b1
    intra = [(s, d) for (s, d) in [(0, 1), (1, 2), (0, 2),
                                   (3, 4), (4, 5), (3, 5)] for _ in range(3)]
    edges = spark.createDataFrame(intra + [(2, 3)], "src long, dst long")
    out = {r["host"]: (r["community"], r["community_size"])
           for r in lg.host_communities(edges, urls).collect()}
    assert out == {
        "a1": ("a1", 3), "a2": ("a1", 3), "a3": ("a1", 3),
        "b1": ("b1", 3), "b2": ("b1", 3), "b3": ("b1", 3),
        "iso": ("iso", 1),
    }

    # weighted vote: p--q at w=1, p--r at w=3; after ONE round p carries
    # r's label (weight dominates the q<r label-asc tie rule)
    urls2 = spark.createDataFrame(
        [(0, "p"), (1, "q"), (2, "r")], "doc_id long, host string")
    edges2 = spark.createDataFrame(
        [(0, 1)] + [(0, 2)] * 3, "src long, dst long")
    one = {r["host"]: r["community"]
           for r in lg.host_communities(edges2, urls2, rounds=1).collect()}
    assert one == {"p": "r", "q": "p", "r": "p"}


def test_review2_fix_regressions(spark):
    """Second-review fixes: duplicate edges can't fake co-citation counts;
    named-agent robots matching is case-insensitive; hits rejects
    iterations<1; syndicated excerpt ids can't collide with real ids."""
    import pytest as _pytest

    from pdf_parser_spark.operators import dedup, linkgraph as lg, weburl

    # one source citing 10 twice + 11 once must NOT reach min_count=2
    edges = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 11)], "src long, dst long"
    )
    assert lg.cocitation_pairs(edges, min_count=2).count() == 0
    # ...but two distinct sources do
    edges2 = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11)], "src long, dst long"
    )
    assert lg.cocitation_pairs(edges2, min_count=2).count() == 1

    txt = "User-agent: foobot\nDisallow: /private/\n\nUser-agent: *\nDisallow: /x/\n"
    robots = spark.createDataFrame([("h", txt)], "host string, robots_txt string")
    r = weburl.parse_robots(robots, agent="FooBot").collect()[0]
    assert r["disallow_all"] == "/private/"  # case-insensitive token match

    docs = _docs(spark, [(0, "t", "en", "s", 1)])
    with _pytest.raises(ValueError):
        lg.hits(docs, spark.createDataFrame([], "src long, dst long"), iterations=0)

    # excerpt ids are negative: no collision at any corpus size
    uni = dedup.with_syndicated(
        spark.createDataFrame(
            [(0, "s", "a b c"), (9, "s", "d e f")],
            "doc_id long, source string, text string",
        )
    )
    ids = sorted(r["doc_id"] for r in uni.collect())
    assert ids == [-10, -1, 0, 9]


def test_trustrank_flows_from_seeds_only(spark):
    """Seed 0 trusts its outlink chain; a disconnected spam pair that no
    seed reaches holds exactly zero trust (PageRank would give it BASE)."""
    from pdf_parser_spark.operators import linkgraph as lg

    docs = _docs(spark, [(i, "t", "en", "s", 1) for i in range(5)])
    # seed 0 -> 1 -> 2 chain; 3 <-> 4 isolated spam farm
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (4, 3)], "src long, dst long"
    )
    out = {r["doc_id"]: r["trust"]
           for r in lg.trustrank(docs, edges, iterations=3, seed_mod=17).collect()}
    assert out[0] == lg.BASE                 # seed holds teleport mass
    assert out[1] > out[2] > 0               # trust decays along the chain
    assert out[3] == 0 and out[4] == 0       # unreachable from any seed
    # contrast: plain pagerank gives the spam pair the BASE floor
    pr = {r["doc_id"]: r["rank"]
          for r in lg.pagerank(docs, edges, iterations=3).collect()}
    assert pr[3] > 0 and pr[4] > 0


def test_spam_mass_splits_trusted_from_farm(spark):
    """Seed chain holds negative/zero spam mass; the isolated farm's rank
    is 100% unexplained (rel_mass_bp == 10000, suspect) — and the columns
    are exactly rank - scaled trust with the decomposed product."""
    from pdf_parser_spark.operators import linkgraph as lg

    docs = _docs(spark, [(i, "t", "en", "s", 1) for i in range(5)])
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (4, 3)], "src long, dst long"
    )
    rows = {r["doc_id"]: r
            for r in lg.spam_mass(docs, edges, iterations=3).collect()}
    pr = {r["doc_id"]: r["rank"]
          for r in lg.pagerank(docs, edges, iterations=3).collect()}
    tr = {r["doc_id"]: r["trust"]
          for r in lg.trustrank(docs, edges, iterations=3).collect()}
    n_docs, n_seeds = 5, 1  # only doc 0 is % 17 == 0
    for i in range(5):
        scaled = (tr[i] * (n_docs // n_seeds)
                  + (tr[i] * (n_docs % n_seeds)) // n_seeds)
        assert scaled == (tr[i] * n_docs) // n_seeds  # decomposition exact
        assert rows[i]["spam_mass"] == pr[i] - scaled
        assert rows[i]["rel_mass_bp"] == max(pr[i] - scaled, 0) * 10000 // pr[i]
    # seed 0: trust*5 dwarfs rank -> negative mass, floored bp, not suspect
    assert rows[0]["spam_mass"] < 0
    assert rows[0]["rel_mass_bp"] == 0 and not rows[0]["suspect"]
    # spam farm: zero trust -> whole rank is spam mass, 10000 bp, suspect
    for i in (3, 4):
        assert rows[i]["trust"] == 0
        assert rows[i]["spam_mass"] == pr[i]
        assert rows[i]["rel_mass_bp"] == 10000 and rows[i]["suspect"]


def test_mojibake_repair_roundtrip(spark):
    from pdf_parser_spark.operators import curation

    moji = "price 10\u00e2\u0082\u00ac caf\u00c3\u00a9"
    clean = "nothing wrong here"
    latin1ish = "s\u00e9ance plain latin-1 accents stay"  # e-acute, no telltale pair
    df = spark.createDataFrame(
        [(1, moji), (2, clean), (3, latin1ish)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in curation.repair_mojibake(df).collect()}
    import hashlib
    # a-circumflex+0x82+not-sign collapses to the euro sign; the
    # telltale pair still fires via caf\u00c3\u00a9
    assert out[1]["had_mojibake"] is True
    assert out[1]["repaired_md5"] == hashlib.md5(
        "price 10\u20ac caf\u00e9".encode()).hexdigest()
    # untouched docs keep their exact bytes
    assert out[2]["had_mojibake"] is False
    assert out[2]["repaired_md5"] == hashlib.md5(clean.encode()).hexdigest()
    assert out[3]["had_mojibake"] is False  # bare accents never trigger
    assert out[3]["repaired_md5"] == hashlib.md5(latin1ish.encode()).hexdigest()


def test_corpus_datasheet_dup_accounting(spark):
    from pdf_parser_spark.operators import textstats

    docs = _docs(spark, [
        (1, "a b c", "en", "s1", 1),
        (2, "a  b   c", "en", "s1", 1),   # whitespace-normalized duplicate
        (3, "x y", "en", "s1", 1),
        (4, "zz", "de", "s1", 1),
    ])
    out = {(r["source"], r["lang"]): r
           for r in textstats.corpus_datasheet(docs).collect()}
    en = out[("s1", "en")]
    assert (en["n_docs"], en["n_distinct"]) == (3, 2)
    assert en["dup_bp"] == (3 - 2) * 10000 // 3  # 3333
    assert en["n_tokens"] == 3 + 3 + 2 and en["mean_tokens"] == 2
    assert out[("s1", "de")]["dup_bp"] == 0


def test_corpus_datasheet_approx_within_hll_band(spark):
    """The HLL face (VERDICT r2 item 7): identical exact counters, and
    n_distinct_approx within a few rsd of the exact distinct count per
    group at sf0.001 — the tolerance the 10^12 swap is allowed to cost."""
    from pdf_parser_spark.operators import textstats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {(r["source"], r["lang"]): r
             for r in textstats.corpus_datasheet(docs).collect()}
    approx = {(r["source"], r["lang"]): r
              for r in textstats.corpus_datasheet_approx(docs).collect()}
    assert set(exact) == set(approx)
    for key, e in exact.items():
        a = approx[key]
        # the exact columns must be bit-identical between the two faces
        assert (a["n_docs"], a["n_tokens"], a["mean_tokens"]) == (
            e["n_docs"], e["n_tokens"], e["mean_tokens"])
        # HLL++ error is ~rsd; allow 5x the configured band (plus the
        # integer floor at tiny groups) so the test pins magnitude, not luck
        tol = max(2.0, 5 * textstats.DATASHEET_HLL_RSD * e["n_distinct"])
        assert abs(a["n_distinct_approx"] - e["n_distinct"]) <= tol, (
            key, a["n_distinct_approx"], e["n_distinct"])


def test_chunk_windows_striding_and_edges(spark):
    """Chunk k covers tokens [k*stride, k*stride+size); the final window may
    be short or even fully contained in the previous one (BERT striding);
    empty docs emit nothing."""
    toks = [f"w{i}" for i in range(17)]
    docs = _docs(spark, [
        (1, " ".join(toks), "en", "s1", 1),
        (2, "a b", "en", "s1", 1),       # single short chunk
        (3, "", "en", "s1", 0),           # empty: no chunks
    ])
    out = [r.asDict() for r in
           curation.chunk_windows(docs, size=8, stride=6).collect()]
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 3 not in by_doc
    c1 = by_doc[1]
    assert [(r["chunk_id"], r["start_tok"], r["n_chunk_tokens"]) for r in c1] \
        == [(0, 0, 8), (1, 6, 8), (2, 12, 5)]
    assert c1[0]["chunk_text"] == " ".join(toks[0:8])
    assert c1[2]["chunk_text"] == " ".join(toks[12:17])  # short tail
    assert by_doc[2] == [{
        "doc_id": 2, "chunk_id": 0, "start_tok": 0,
        "n_chunk_tokens": 2, "chunk_text": "a b",
    }]


def test_chunk_windows_coverage_properties(spark):
    """For every n in 1..40 (one Spark job): chunk count == ceil(n/stride),
    every token index is covered by >= 1 chunk, every chunk has 1..size
    tokens, and concatenating stride-prefixes of the chunks (plus the last
    chunk's tail) reconstructs the document exactly."""
    size, stride = 8, 6
    docs = _docs(spark, [
        (n, " ".join(f"t{n}_{i}" for i in range(n)), "en", "s", 1)
        for n in range(1, 41)
    ])
    out = {}
    for r in curation.chunk_windows(docs, size=size, stride=stride).collect():
        out.setdefault(r["doc_id"], []).append(r)
    for n in range(1, 41):
        chunks = sorted(out[n], key=lambda r: r["chunk_id"])
        assert len(chunks) == -(-n // stride)  # ceil
        covered = set()
        for r in chunks:
            toks = r["chunk_text"].split(" ")
            assert toks == [f"t{n}_{i}" for i in range(
                r["start_tok"], min(r["start_tok"] + size, n))]
            assert 1 <= r["n_chunk_tokens"] == len(toks) <= size
            covered.update(range(r["start_tok"], r["start_tok"] + len(toks)))
        assert covered == set(range(n))


def test_mixture_resample_epoch_math(spark):
    """Over-weighted source upsamples (1 full copy + md5-fractional extra),
    under-weighted downsamples (fractional keep only); exact epochs in bp
    against the hand-computed formula, per-doc copies against the md5."""
    rows = [(i, "t " * 10, "en", "A", 1) for i in range(10)]
    rows += [(100 + i, "t " * 10, "en", "B", 1) for i in range(10)]
    docs = _docs(spark, [(i, t.strip(), l, s, n) for i, t, l, s, n in rows])
    out = {(r["doc_id"], r["copy_id"]): r for r in curation.mixture_resample(
        docs, weights={"A": 7500, "B": 2500}).collect()}
    # budget = 200 tokens; e_A = 200*7500 div 100 = 15000bp -> 1 + frac 5000
    # e_B = 200*2500 div 100 = 5000bp -> 0 + frac 5000
    for i in range(10):
        frac = int(hashlib.md5(f"mix:{i}".encode()).hexdigest()[:8], 16) % 10000 < 5000
        copies_a = [k for k in out if k[0] == i]
        assert len(copies_a) == 1 + frac
        frac_b = int(hashlib.md5(f"mix:{100+i}".encode()).hexdigest()[:8], 16) % 10000 < 5000
        copies_b = [k for k in out if k[0] == 100 + i]
        assert len(copies_b) == (1 if frac_b else 0)
    # every emitted row carries the right copy_id sequence and n_tokens
    assert all(r["n_tokens"] == 10 for r in out.values())
    assert all(k[1] <= r["n_copies"] for k, r in out.items())


def test_doc_keywords_rank_tfidf_ordering(spark):
    from pdf_parser_spark.operators import textstats

    docs = _docs(spark, [
        (1, "the the rare common", "en", "s", 1),
        (2, "the common common", "en", "s", 1),
    ])
    out = {(r["doc_id"], r["kw_rank"]): (r["term"], r["tf"], r["df"])
           for r in textstats.doc_keywords(docs, k=2).collect()}
    # doc 1: 'rare' (df=1) beats 'the'/'common' (df=2) despite tf=2 for 'the'
    assert out[(1, 1)] == ("rare", 1, 1)
    assert out[(1, 2)] == ("the", 2, 2)   # df tie -> tf desc
    # doc 2: only shared terms; 'common' (tf=2) beats 'the' (tf=1)
    assert out[(2, 1)] == ("common", 2, 2)
    assert out[(2, 2)] == ("the", 1, 2)


def test_anchor_text_cap_binds_on_mega_target(spark):
    # r2 verdict item 4: a high-in-degree target keeps only the max_texts
    # lexicographically-smallest DISTINCT texts, while the counts stay exact
    from pdf_parser_spark.operators import linkgraph as lg

    pages = spark.createDataFrame(
        [(src, f'<a href="https://n/doc/7">t{src:02d}</a>') for src in range(5)]
        + [(9, '<a href="https://n/doc/8">solo</a>')],
        "doc_id long, html string",
    )
    out = {r["dst"]: r for r in
           lg.anchor_text_index(pages, max_texts=3).collect()}
    assert (out[7]["n_inlinks"], out[7]["n_srcs"]) == (5, 5)  # counts uncapped
    assert out[7]["texts"] == "t00|t01|t02"  # 3 smallest of 5 distinct
    assert out[8]["texts"] == "solo"  # cap never binds below k


def test_pagerank_early_stop_equals_fixed_k(spark):
    # r2 verdict item 8: on a converged graph (2-cycle is an exact integer
    # fixed point after one update) the early-stop result equals fixed-k
    from pdf_parser_spark.operators import linkgraph as lg

    docs = _docs(spark, [(i, "t", "en", "s", 1) for i in range(2)])
    edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    fixed = {r["doc_id"]: r["rank"]
             for r in lg.pagerank(docs, edges, iterations=5).collect()}
    early = {r["doc_id"]: r["rank"]
             for r in lg.pagerank(docs, edges, iterations=5,
                                  until_converged=True).collect()}
    assert early == fixed
    assert fixed == {0: lg.UNIT, 1: lg.UNIT}  # the exact fixed point


def test_corpus_frontier_funnel_excludes_rejected_and_gated(spark):
    # r2 verdict item 2: the composed crawl cycle schedules ONLY docs that
    # pass BOTH the real extraction (fail-soft scanned rejection) and the
    # quality gate
    from pdf_parser_spark.operators import linkgraph as lg

    good = ("the quick brown fox jumps over the lazy dog and runs on " * 6).strip()
    rows = [(i, good, "en", f"s{i % 3}", 1) for i in range(8)]
    # doc 8: passes the gate (>=50 tokens) but extraction rejects it —
    # 9 of its 10 form-feed pages are sparse (<50 chars) => scanned
    rows.append((8, good + "\fx" * 9, "en", "s0", 1))
    # doc 9: extraction ok (one dense page) but gate-fails (<50 tokens)
    rows.append((9, "a short page with a few plain words over fifty characters", "en", "s1", 1))
    docs = _docs(spark, rows)
    pages = docs.select(
        F.concat(F.lit("doc://"), "source", F.lit("/"), "doc_id").alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text", "lang",
    )
    scheduled = {r["doc_id"]
                 for r in lg.corpus_frontier(docs, pages, per_domain=9).collect()}
    assert scheduled  # the surviving subgraph is non-empty
    assert 8 not in scheduled  # extraction-rejected despite passing the gate
    assert 9 not in scheduled  # gate-failed despite extraction ok
    assert scheduled <= set(range(8))


def test_banded_blocking_defuses_single_source_quadratic(spark):
    # r2 verdict item 3: one giant source must NOT produce O(n^2) candidate
    # pairs under the new default blocking, while true near-dups in that
    # same source are still caught
    from pdf_parser_spark.operators import dedup

    base = " ".join(f"tok{i}" for i in range(40))
    rows = [(i, "onesource", " ".join(f"u{i}w{j}" for j in range(30)))
            for i in range(40)]                      # pairwise-disjoint vocab
    rows += [(100, "onesource", base), (101, "onesource", base + " extra")]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # banded candidates: only the engineered near-dup pair survives — the 40
    # dissimilar same-source docs contribute ZERO candidates (source-blocking
    # would have generated C(42,2) = 861)
    cands = dedup._band_candidates(docs, 3).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in cands] == [(100, 101)]
    out = dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in out] == [(100, 101)]
    # containment's inverted bottom-k index: same property (candidates are
    # hash-co-occurrence only, never block-quadratic)
    cpairs = dedup.containment_pairs(docs, threshold_bp=8000).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in cpairs} == {(100, 101), (101, 100)}


def test_dup_spans_exact_boundaries_and_merging(spark):
    """Two docs share a 12-token run spliced mid-text; a third is clean.
    With n=4 the duplicated windows must merge into ONE maximal span per
    doc covering exactly the shared run (window resolution = n)."""
    from pdf_parser_spark.operators import dedup

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    a = "p1 p2 p3 " + shared + " s1 s2"
    b = "q1 q2 " + shared + " t1 t2 t3"
    c = "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"
    df = _docs(
        spark,
        [(1, a, "en", "s", 0), (2, b, "en", "s", 0), (3, c, "en", "s", 0)],
    ).withColumn("toks_sp", F.split(F.trim(F.col("text")), r"\s+"))
    rows = {
        r["doc_id"]: r
        for r in dedup.dup_spans(df, n=4, min_df=2).collect()
    }
    assert 3 not in rows and len(rows) == 2
    # doc 1: shared run occupies token indices 3..14 (0-based)
    assert (rows[1]["span_start"], rows[1]["span_end"]) == (3, 14)
    assert rows[1]["span_len"] == 12
    assert rows[1]["n_windows"] == 12 - 4 + 1
    # doc 2: run occupies 2..13
    assert (rows[2]["span_start"], rows[2]["span_end"]) == (2, 13)


def test_dup_spans_distinct_runs_stay_separate(spark):
    """Two shared runs separated by a > n doc-specific gap must come out as
    two islands, not one."""
    from pdf_parser_spark.operators import dedup

    r1 = "a1 a2 a3 a4 a5"
    r2 = "b1 b2 b3 b4 b5"
    gap_x = "x1 x2 x3 x4 x5 x6"
    gap_y = "y1 y2 y3 y4 y5 y6"
    df = _docs(
        spark,
        [
            (1, f"{r1} {gap_x} {r2}", "en", "s", 0),
            (2, f"{r1} {gap_y} {r2}", "en", "s", 0),
        ],
    ).withColumn("toks_sp", F.split(F.trim(F.col("text")), r"\s+"))
    out = dedup.dup_spans(df, n=3, min_df=2).collect()
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"]) for r in out
    )
    assert spans == [(1, 0, 4), (1, 11, 15), (2, 0, 4), (2, 11, 15)]


def test_dup_spans_short_docs_produce_no_windows(spark):
    from pyspark.sql import functions as F2
    from pdf_parser_spark.operators import dedup

    df = _docs(
        spark, [(1, "one two", "en", "s", 0), (2, "one two", "en", "s", 0)]
    ).withColumn("toks_sp", F2.split(F2.trim(F2.col("text")), r"\s+"))
    assert dedup.dup_spans(df, n=8, min_df=2).count() == 0


def test_dsir_select_exact_ratio_math(spark):
    """Hand-computed hashed-bigram importance: doc 0 is the target; doc 1
    shares its bigram (ratio tgt*10000//raw = 5000 >= prior 1111 ->
    selected), doc 2's bigram never occurs in the target (ratio 0 ->
    dropped)."""
    df = _docs(
        spark,
        [
            (0, "a b", "en", "s", 0),
            (1, "a b", "en", "s", 0),
            (2, "x y", "en", "s", 0),
        ],
    )
    rows = {r["doc_id"]: r for r in curation.dsir_select(df).collect()}
    assert rows[0]["score_bp"] == 5000 and rows[0]["selected"]
    assert rows[1]["score_bp"] == 5000 and rows[1]["selected"]
    assert rows[2]["score_bp"] == 0 and not rows[2]["selected"]
    assert all(r["n_grams"] == 1 for r in rows.values())


def test_paragraph_tags_attributes_and_mixer(spark):
    """Dolma-tagger attributes on an engineered 4-line doc: nav row dropped
    by the mixer, short row dropped, symbol-heavy row dropped, prose row
    kept; alpha_bp is the exact integer share."""
    df = _docs(spark, [(1, "unused", "en", "s", 0)]).withColumn(
        "text_multi",
        F.lit("Home | About | Contact\nhi.\n1234 5678 9012\nThis is clean prose text"),
    )
    rows = curation.paragraph_tags(df).collect()
    assert [r["para_idx"] for r in rows] == [0, 1, 2, 3]
    nav, short, nums, prose = rows
    assert nav["is_nav"] and not nav["keep"]
    assert short["n_tokens"] == 1 and short["ends_punct"] and not short["keep"]
    # "1234 5678 9012": zero alpha chars of 14 -> 0 bp, dropped
    assert nums["alpha_bp"] == 0 and not nums["keep"]
    # "This is clean prose text": 20 alpha of 24 chars -> 8333 bp
    assert prose["alpha_bp"] == 8333 and prose["n_tokens"] == 5 and prose["keep"]


def test_token_drift_exact_shares_and_tiebreak(spark):
    """Engineered drift: old corpus 3:1 a/b, new corpus 1:3 -> deltas are
    exactly -+5000 bp; top_k=1 must keep the lexicographically-smaller
    bucket of the tied pair."""
    from pdf_parser_spark.operators import textstats

    old = spark.createDataFrame([("a a a b",)], "text string")
    new = spark.createDataFrame([("a b b b",)], "text string")
    rows = textstats.token_drift(old, new).collect()
    ba = int(hashlib.md5(b"a").hexdigest()[:8], 16) % textstats.DRIFT_BUCKETS
    bb = int(hashlib.md5(b"b").hexdigest()[:8], 16) % textstats.DRIFT_BUCKETS
    got = {r["bucket"]: r for r in rows}
    assert set(got) == {ba, bb}
    assert got[ba]["old_bp"] == 7500 and got[ba]["new_bp"] == 2500
    assert got[ba]["delta_bp"] == -5000 and got[bb]["delta_bp"] == 5000
    top1 = textstats.token_drift(old, new, top_k=1).collect()
    assert len(top1) == 1 and top1[0]["bucket"] == min(ba, bb)


def test_strip_dup_spans_removes_all_and_pins_bytes(spark):
    """Apply-side of dup_spans: the shared run disappears from BOTH docs
    (remove-all policy) and the surviving bytes hash exactly; a clean doc
    passes through byte-identical with zero dup tokens."""
    from pdf_parser_spark.operators import dedup

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    df = _docs(
        spark,
        [
            (1, "p1 p2 " + shared + " s1", "en", "s", 0),
            (2, shared + " t1 t2", "en", "s", 0),
            (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9", "en", "s", 0),
        ],
    ).withColumn("toks_sp", F.split(F.trim(F.col("text")), r"\s+"))
    rows = {r["doc_id"]: r for r in dedup.strip_dup_spans(df, n=4, min_df=2).collect()}
    assert rows[1]["n_dup_tokens"] == 8
    assert rows[1]["clean_md5"] == hashlib.md5(b"p1 p2 s1").hexdigest()
    assert rows[2]["n_dup_tokens"] == 8
    assert rows[2]["clean_md5"] == hashlib.md5(b"t1 t2").hexdigest()
    assert rows[3]["n_dup_tokens"] == 0
    assert rows[3]["clean_md5"] == hashlib.md5(b"u1 u2 u3 u4 u5 u6 u7 u8 u9").hexdigest()


def test_strip_dup_spans_full_removal_yields_empty_hash(spark):
    from pdf_parser_spark.operators import dedup

    df = _docs(
        spark,
        [(1, "a b c d", "en", "s", 0), (2, "a b c d", "en", "s", 0)],
    ).withColumn("toks_sp", F.split(F.trim(F.col("text")), r"\s+"))
    rows = dedup.strip_dup_spans(df, n=4, min_df=2).collect()
    assert all(r["n_dup_tokens"] == 4 for r in rows)
    assert all(r["clean_md5"] == hashlib.md5(b"").hexdigest() for r in rows)


def test_late_replay_drops_redelivered_rows(spark):
    """The 4-batch watermark replay: the re-delivery batch must report
    rows dropped by the watermark, emit nothing by itself beyond the
    boundary eviction, and the final append output must contain no
    duplicate (window, event_type) keys."""
    from pdf_parser_spark.streaming.late import late_replay

    out, prog = late_replay(spark, SF001)
    by_batch = {p["batchId"]: p for p in prog}
    redelivery = by_batch[2]
    dropped = redelivery["stateOperators"][0]["numRowsDroppedByWatermark"]
    assert dropped > 0
    rows = out.collect()
    keys = [(r["window_start"], r["event_type"]) for r in rows]
    assert len(keys) == len(set(keys))  # append-mode exactly-once per window
    out.unpersist()


def test_length_quantiles_exact_rank_math(spark):
    """Hand-computed quantiles over 4 docs of lengths 1,2,3,4 in one
    source: ceil-rank targets are p25->1, p50->2, p75->3, p90->4, p99->4."""
    from pdf_parser_spark.operators import textstats

    rows = [(i, " ".join(["w"] * i), "en", "A", 0) for i in (1, 2, 3, 4)]
    out = textstats.length_quantiles(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_docs"], r["p25"], r["p50"], r["p75"], r["p90"], r["p99"]) == (
        4, 1, 2, 3, 4, 4,
    )


def test_inverted_index_rank_cap_and_df_floor(spark):
    """Engineered corpus: term 'aa' in 3 docs (df floor met) with tfs
    3,1,2 -> postings ranked tf desc, doc asc and capped; 'bb' in 2 docs
    -> pruned by min_df; tf tie broken by doc_id."""
    from pdf_parser_spark.operators import textstats

    docs = _docs(
        spark,
        [
            (1, "aa aa aa bb", "en", "s", 0),
            (2, "aa bb", "en", "s", 0),
            (3, "aa aa cc", "en", "s", 0),
            (4, "cc cc", "en", "s", 0),
            (5, "cc", "en", "s", 0),
        ],
    )
    out = {r["term"]: r for r in
           textstats.inverted_index(docs, min_df=3, k=2).collect()}
    assert set(out) == {"aa", "cc"}  # 'bb' df=2 pruned
    assert out["aa"]["dfreq"] == 3
    assert out["aa"]["postings"] == "1:3|3:2"  # capped at 2 of 3
    # 'cc': tfs 1,2,1 -> 4:2 first, then tie (3:1 vs 5:1) -> doc asc
    assert out["cc"]["postings"] == "4:2|3:1"


def test_paragraph_mixer_apply_matches_tags_and_pins_bytes(spark):
    """Mixer apply must agree row-for-row with the tags' keep verdicts and
    reassemble surviving paragraphs byte-exactly."""
    df = _docs(spark, [(1, "unused", "en", "s", 0)]).withColumn(
        "text_multi",
        F.lit("Home | About\nhi.\nThis is clean prose text\nAnother good plain line"),
    )
    tags = curation.paragraph_tags(df).collect()
    mix = curation.paragraph_mixer_apply(df).collect()[0]
    assert mix["n_paras"] == 4
    assert mix["n_kept"] == sum(1 for t in tags if t["keep"]) == 2
    expect = "This is clean prose text\nAnother good plain line"
    assert mix["clean_md5"] == hashlib.md5(expect.encode()).hexdigest()


def test_corpus_build_composes_exact_stage_chain(spark):
    """corpus_build over sf0.001 must equal running the five stages by
    hand, and every stage must actually cut the set (a stage that never
    fires would make the composed oracle vacuous)."""
    from pdf_parser_spark.operators import dedup, textstats

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    gate_ids = {r["doc_id"] for r in
                textstats.quality_gate(docs).where("passed").collect()}
    gated = docs.where(F.col("doc_id").isin(list(gate_ids)))
    keep = {r["keep_doc_id"] for r in dedup.exact_dedup_groups(gated).collect()}
    kept = gated.where(F.col("doc_id").isin(list(keep)))
    cont = {r["doc_id"] for r in
            curation.decontaminate(kept, curation.benchmark_snippets(docs))
            .where("contaminated").collect()}
    clean = kept.where(~F.col("doc_id").isin(list(cont)))
    samp = {r["doc_id"] for r in curation.stratified_sample(clean).collect()}
    expected = {r["doc_id"]: r["shard_id"] for r in
                curation.pack_shards(
                    clean.where(F.col("doc_id").isin(list(samp)))
                ).collect()}
    got = {r["doc_id"]: r["shard_id"] for r in
           curation.corpus_build(docs).collect()}
    assert got == expected and len(got) > 0
    n_docs = docs.count()
    # each stage genuinely cuts at this sf
    assert len(gate_ids) < n_docs
    assert len(cont) > 0
    assert len(samp) < clean.count()


def test_recrawl_schedule_backoff_math(spark):
    """Hand-built series: a never-changing url backs off 2^pairs (capped),
    an always-changing url stays at BASE, a gap breaks the pair chain,
    and a single-observation url gets the explore default."""
    from pdf_parser_spark.operators import snapshot as sn

    rows = [
        # doc 1: present 0-3, never changes -> 3 stable pairs -> 6h<<3=48
        *[(1, t, "same") for t in range(4)],
        # doc 2: present 0-3, changes every cycle -> 3 pairs 3 changes -> 6h
        *[(2, t, f"v{t}") for t in range(4)],
        # doc 3: present 0,1,3 (gap at 2): pairs = (0,1) only -> 1 stable
        (3, 0, "x"), (3, 1, "x"), (3, 3, "x"),
        # doc 4: seen once -> 0 pairs -> BASE
        (4, 2, "y"),
        # doc 5: 6 stable pairs would exceed the cap -> capped at 2^4
        *[(5, t, "s") for t in range(7)],
    ]
    snaps = spark.createDataFrame(rows, "doc_id long, snap_ts long, fp string")
    out = {r["doc_id"]: r for r in sn.recrawl_schedule(snaps).collect()}
    assert out[1]["interval_hours"] == 6 << 3 and out[1]["n_changes"] == 0
    assert out[2]["interval_hours"] == 6 and out[2]["n_changes"] == 3
    assert out[3]["n_pairs"] == 1 and out[3]["interval_hours"] == 12
    assert out[4]["n_pairs"] == 0 and out[4]["interval_hours"] == 6
    assert out[5]["interval_hours"] == 6 << 4  # capped
    assert out[1]["next_fetch_ts"] == 3 * 24 + 48


def test_image_ahash_groups_identical_rasters(spark):
    """Docs 0 and 288 synthesize byte-identical BMPs (dims repeat mod
    3*lcm(32,24)) -> same ahash, n_same >= 2; a doc with different dims
    hashes differently; non-BMP payloads (kind 1/2) are skipped by magic
    sniff."""
    from pdf_parser_spark.operators import multimodal as mm

    docs = _docs(
        spark,
        [(i, "t", "en", "s", 0) for i in (0, 288, 3, 1, 2)],
    )
    out = {r["doc_id"]: r for r in
           mm.image_ahash(mm.synthetic_media(docs)).collect()}
    assert set(out) == {0, 288, 3}  # kind-1/2 skipped
    assert out[0]["ahash"] == out[288]["ahash"]
    assert out[0]["n_same"] == 2 and out[288]["n_same"] == 2
    assert out[3]["ahash"] != out[0]["ahash"] and out[3]["n_same"] == 1
    assert len(out[0]["ahash"]) == mm.AHASH_GRID ** 2
    assert set(out[0]["ahash"]) <= {"0", "1"}


def test_bpe_merges_textbook_example(spark):
    """Sennrich's classic: 'low'x3 + 'lower' + 'newest'x2 learns (l,o),
    (lo,w) first; count-2 ties then break lexicographically (e,s) ->
    (e,w) -> (es,t); greedy left-to-right merge is exact."""
    from pdf_parser_spark.operators import textstats

    docs = _docs(
        spark, [(1, "low low low lower newest newest", "en", "s", 0)]
    )
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in textstats.bpe_merges(docs, k=5).collect()
    ]
    assert got == [
        (1, "l", "o", 4),
        (2, "lo", "w", 4),
        (3, "e", "s", 2),
        (4, "e", "w", 2),
        (5, "es", "t", 2),
    ]


def test_bpe_merges_greedy_nonoverlap(spark):
    """'aaaa' with pair (a,a): greedy left-to-right yields 2 merges per
    word occurrence, and the next round merges (aa,aa)."""
    from pdf_parser_spark.operators import textstats

    docs = _docs(spark, [(1, "aaaa aaaa aaaa", "en", "s", 0)])
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in textstats.bpe_merges(docs, k=2).collect()
    ]
    # round 1: 3 adjacent (a,a) pairs per word x3 words = 9
    # round 2: symbols [aa, aa] -> one (aa,aa) pair per word = 3
    assert got == [(1, "a", "a", 9), (2, "aa", "aa", 3)]


def test_bpe_apply_textbook_compression(spark):
    """Apply the learned merges back to the corpus: after (l,o), (lo,w),
    'low' is ONE symbol; with k=2 'lower' is low+e+r = 3, 'newest' stays
    6 chars.  Counts are exact and n_chars always equals raw letters."""
    from pdf_parser_spark.operators import textstats

    docs = _docs(spark, [
        (1, "low low low lower newest newest", "en", "s", 0),
        (2, "low", "en", "s", 0),
        (3, "   ", "en", "s", 0),   # whitespace-only: no words, drops out
    ])
    out = {r["doc_id"]: r for r in textstats.bpe_apply(docs, k=2).collect()}
    # doc 1: words 6; chars 3*3 + 5 + 6*2 = 26;
    # symbols: low=1 (x3) + lower=3 + newest=6 (x2) = 18
    assert out[1]["n_words"] == 6 and out[1]["n_chars"] == 26
    assert out[1]["n_bpe_symbols"] == 18
    # doc 2 shares the corpus-learned merges: 'low' -> 1 symbol
    assert out[2]["n_bpe_symbols"] == 1 and out[2]["n_chars"] == 3
    assert 3 not in out
    # zero merges = character tokenizer: symbols == chars everywhere
    base = {r["doc_id"]: r for r in textstats.bpe_apply(docs, k=0).collect()}
    assert all(base[d]["n_bpe_symbols"] == base[d]["n_chars"] for d in base)


def test_bpe_local_fit_equals_distributed_fold(spark):
    """The production driver-local trainer (one corpus word-count pass +
    all merges on the collected frequency-capped head) must reproduce the
    distributed _bpe_train fold EXACTLY when the cap covers the vocabulary
    — the r3 verdict's done-criterion for item 2.  Pins:
    (a) merge tables identical on the sf0.001 documents at k=4 and on the
        textbook corpus at k=5 (tie-breaks included);
    (b) apply faces identical (bpe_apply_local == bpe_apply row-for-row);
    (c) the frequency cap is a real floor: with cap=1 only the top word
        votes, so the learned merges come from that word alone."""
    from pdf_parser_spark.operators import textstats

    real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dist = [(r["rank"], r["left"], r["right"], r["pair_count"])
            for r in textstats.bpe_merges(real, k=4).collect()]
    local = textstats.bpe_fit_local(real, k=4)
    assert local == dist and len(local) == 4

    docs = _docs(
        spark, [(1, "low low low lower newest newest", "en", "s", 0)]
    )
    assert textstats.bpe_fit_local(docs, k=5) == [
        (1, "l", "o", 4), (2, "lo", "w", 4), (3, "e", "s", 2),
        (4, "e", "w", 2), (5, "es", "t", 2),
    ]

    # (b) apply equivalence on the real corpus (same join shape, the
    # distinct-word Arrow tokenizer must agree with the trainer's fold)
    a = sorted(map(tuple, textstats.bpe_apply(real, k=4).collect()))
    b = sorted(map(tuple, textstats.bpe_apply_local(real, k=4).collect()))
    assert a == b and len(a) > 0

    # (c) cap=1: only 'low' (freq 3, top by (freq desc, word asc)) votes —
    # merges are (l,o) then (lo,w) with pair_count 3, then the head word
    # is a single symbol and training stops early
    capped = textstats.bpe_fit_local(docs, k=5, vocab_cap=1)
    assert capped == [(1, "l", "o", 3), (2, "lo", "w", 3)]


def test_ingest_pipeline_composes_stage_by_stage(spark):
    """The composed chain must equal running decode -> NFC -> gate by
    hand, and each stage must actually matter on an engineered corpus."""
    import unicodedata

    from pdf_parser_spark.operators import curation, textstats

    passing = ("the quick brown foxes jumped over the lazy sleeping "
               "hounds in the warm golden light with many other small "
               "birds for fun ") * 3
    rows = [
        (0, passing),                      # utf-8, clean, passes gate
        (4, passing),                      # latin-1 branch (+é. suffix)
        (2, passing),                      # utf-16-le branch
        (5, "zz qq"),                      # utf-8 but fails the gate
    ]
    docs = _docs(spark, [(i, t, "en", "s", 1) for i, t in rows])
    out = {r["doc_id"]: r for r in curation.ingest_pipeline(
        curation.with_mixed_encodings(docs)).collect()}
    # hand-composed expectation per doc
    for i, t in rows:
        exp_text = unicodedata.normalize(
            "NFC", t + ("é." if i % 5 == 4 else ""))
        assert out[i]["text_md5"] == hashlib.md5(
            exp_text.encode("utf-8")).hexdigest()
    assert out[0]["charset"] == "utf-8" and out[0]["passed"]
    assert out[4]["charset"] == "latin-1" and out[4]["passed"]
    assert out[2]["charset"] == "utf-16-le" and out[2]["passed"]
    assert out[5]["charset"] == "utf-8" and not out[5]["passed"]
    # gate verdicts equal the standalone gate run on the decoded text
    gate = {r["doc_id"]: r["passed"] for r in textstats.quality_gate(
        docs.withColumn("text", F.when(F.col("doc_id") % 5 == 4,
                                       F.concat("text", F.lit("é.")))
                        .otherwise(F.col("text")))).collect()}
    assert all(out[i]["passed"] == gate[i] for i, _ in rows)


def test_lm_surprisal_exact_bits_oov_and_terciles(spark):
    """Pin the integer LM math: reference slice = doc_id % 5 == 0 only,
    Laplace bits = len(bin((N+V) div (c+1))) - 1, OOV priced at the
    floor(log2(N+V)) constant, head/middle/tail are value-terciles of
    mean_cb (head = most reference-like)."""
    from pdf_parser_spark.operators import textstats

    docs = _docs(spark, [
        (0, "aa aa bb", "en", "s", 1),      # ref slice
        (5, "aa cc", "en", "s", 1),         # ref slice
        (1, "AA aa aa aa", "en", "s", 1),   # lowercased -> all aa
        (2, "zz zz", "en", "s", 1),         # all OOV
        (3, "aa bb cc zz", "en", "s", 1),   # mixed
    ])
    out = {r["doc_id"]: r for r in textstats.lm_surprisal(docs).collect()}
    # ref counts: aa:3 bb:1 cc:1 -> N=5 V=3 N+V=8
    # bits: aa -> 8 div 4 = 2 -> 1; bb/cc -> 4 -> 2; OOV -> 8 -> 3
    assert (out[1]["bits_sum"], out[1]["n_oov"], out[1]["mean_cb"]) == (4, 0, 100)
    assert (out[0]["bits_sum"], out[0]["mean_cb"]) == (4, 133)      # 1+1+2
    assert (out[5]["bits_sum"], out[5]["mean_cb"]) == (3, 150)      # 1+2
    assert (out[3]["bits_sum"], out[3]["n_oov"], out[3]["mean_cb"]) == (8, 1, 200)
    assert (out[2]["bits_sum"], out[2]["n_oov"], out[2]["mean_cb"]) == (6, 2, 300)
    # value-terciles over mean_cb {100,133,150,200,300}: tier =
    # (3*cum_before) div 5 -> head,head,middle,middle,tail
    assert [out[i]["bucket"] for i in (1, 0, 5, 3, 2)] == [
        "head", "head", "middle", "middle", "tail"]
    # widening the reference to every doc changes the model: zz is now
    # in-vocab, so doc 2 stops paying the OOV constant
    allref = {r["doc_id"]: r
              for r in textstats.lm_surprisal(docs, ref_mod=1).collect()}
    assert allref[2]["n_oov"] == 0
    assert allref[2]["bits_sum"] < out[2]["bits_sum"]


def test_gopher_rules_each_rule_fires_independently(spark):
    from pdf_parser_spark.operators import textstats

    stopful = "the cat and the dog have been known to sit with all of that "
    good = (stopful * 5).strip()                    # 65 words, all rules pass
    short = "the of and with tiny"                  # < 50 words
    bullets = "\n".join(["- item " + stopful] * 10)  # 10/10 bullet-led lines
    dots = "\n".join([stopful + "..."] * 4 + [stopful])  # 4/5 ellipsis-ended
    hashy = good + " " + " ".join(["#"] * 20)       # symbol ratio > 0.1
    numeric = " ".join(str(i) for i in range(60)) + " the of and with"
    nostop = " ".join(f"w{i}" for i in range(60))   # zero required stopwords
    docs = spark.createDataFrame(
        [(0, good), (1, short), (2, bullets), (3, dots), (4, hashy),
         (5, numeric), (6, nostop)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textstats.gopher_rules(docs).collect()}
    assert out[0]["passes"] and all(
        out[0][c] for c in out[0].asDict() if c.startswith("ok_"))
    assert not out[1]["ok_word_count"] and not out[1]["passes"]
    # every line bullet-led -> 10*10 > 9*10 fails; the words themselves fine
    assert not out[2]["ok_bullet_lines"] and out[2]["ok_word_count"]
    assert not out[3]["ok_ellipsis_lines"] and out[3]["ok_bullet_lines"]
    assert not out[4]["ok_symbol_ratio"] and out[4]["n_symbols"] == 20
    # 60 of 64 words are bare numbers -> alpha share 4/64 < 80%
    assert not out[5]["ok_alpha_words"]
    assert not out[6]["ok_stopwords"] and out[6]["stop_hits"] == 0
    # cross-multiplied boundary: exactly 10% symbols still PASSES (<=)
    edge = spark.createDataFrame(
        [(7, " ".join(["the"] * 45 + ["of", "and", "with", "to"])
          + " #" * 0 + " " + " ".join(["#"] * 0))],
        "doc_id long, text string",
    )
    # 49 words 0 symbols trivially ok; now 50 words 5 symbols = exactly 0.1
    edge2 = spark.createDataFrame(
        [(8, " ".join(["the"] * 45 + ["#"] * 5))],
        "doc_id long, text string",
    )
    r8 = textstats.gopher_rules(edge2).collect()[0]
    assert r8["n_words"] == 50 and r8["n_symbols"] == 5
    assert r8["ok_symbol_ratio"]  # 5*10 <= 50, inclusive boundary


def test_c4_rules_line_and_page_filters(spark):
    import hashlib

    from pdf_parser_spark.operators import textstats

    s1 = "the quick brown fox jumps over the lazy dog."
    s2 = "a second proper sentence with enough words here."
    s3 = "and a third sentence closes out the page."
    good = "\n".join([s1, s2, s3])
    docs = spark.createDataFrame(
        [
            (0, good),                                   # everything passes
            (1, "\n".join([s1, s2, s3,
                           "no terminal punctuation on this line",
                           "Too few.",                   # < 5 words
                           "Please enable JavaScript to continue reading.",
                           "We updated our privacy policy this week."])),
            (2, "\n".join([s1, s2])),                    # only 2 sentences
            (3, good + "\nlorem ipsum dolor sit amet."),
            (4, good + "\nif (x) { return y; } done now."),
            (5, good + "\nwin big at the casino tonight folks."),
            (6, 'she said "hello there my friend and neighbor"'),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textstats.c4_rules(docs).collect()}

    r0 = out[0]
    assert r0["passes"] and r0["n_kept"] == 3 and r0["n_sentences"] == 3
    assert r0["kept_md5"] == hashlib.md5(good.encode()).hexdigest()

    # line filter: punct-less, short, javascript, and policy lines all drop,
    # but the page still passes on the three surviving sentences
    r1 = out[1]
    assert r1["n_lines"] == 7 and r1["n_kept"] == 3 and r1["passes"]
    assert r1["kept_md5"] == r0["kept_md5"]

    # page filter: < 3 sentences kills even though every line survives
    r2 = out[2]
    assert r2["n_kept"] == 2 and not r2["ok_sentences"] and not r2["passes"]

    # page killers fire on the ORIGINAL text even when their line also
    # contributes sentences
    assert not out[3]["ok_lorem"] and not out[3]["passes"]
    assert out[3]["ok_brace"] and out[3]["ok_badword"]
    assert not out[4]["ok_brace"] and out[4]["ok_lorem"]
    assert not out[5]["ok_badword"] and out[5]["ok_brace"]
    # the killer line itself was a valid sentence -> kept by the LINE filter
    assert out[5]["n_kept"] == 4

    # closing-quote terminal punct keeps the line, but contributes no [.!?]
    # sentence ends -> page fails the min-sentence rule
    r6 = out[6]
    assert r6["n_kept"] == 1 and r6["n_sentences"] == 0 and not r6["passes"]


def test_invisible_scrub_strips_class_but_keeps_structure(spark):
    import hashlib

    from pdf_parser_spark.operators import curation

    dirty = "﻿a​b­c\td\ne\x07f‎‏⁠g\x1fh"
    clean = "abc\td\nefgh"
    docs = spark.createDataFrame(
        [(1, dirty), (2, "plain text stays put")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curation.invisible_scrub(docs).collect()}
    r1 = out[1]
    assert r1["n_stripped"] == len(dirty) - len(clean) == 8
    assert r1["changed"]
    assert r1["text_md5"] == hashlib.md5(clean.encode()).hexdigest()
    r2 = out[2]
    assert r2["n_stripped"] == 0 and not r2["changed"]


def test_bm25_formula_query_derivation_and_ranking(spark):
    """BM25 rows must equal a pure-Python twin of the exact-BIGINT rational
    + single-ln formula; query derivation pins the (df desc, term asc)
    tie-break ('also' and 'rare' tie at df=2 -> 'also' wins)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from pdf_parser_spark.operators import textstats as ts

    docs = _docs(spark, [
        (1, "rare common common", "en", "s", 0),
        (2, "rare common filler filler filler filler", "en", "s", 0),
        (3, "common also here today", "en", "s", 0),
        (4, "also unrelated words entirely different", "en", "s", 0),
    ])
    out = ts.bm25_topk(docs, n_queries=1, k=4).collect()
    assert [r["q_terms"] for r in out] == ["common also"] * 4

    N, T = 4, 18  # 4 docs, 3+6+4+5 tokens
    dls = {1: 3, 2: 6, 3: 4, 4: 5}
    tfs = {  # doc -> [(tf, df)] for matched query terms
        1: [(2, 3)], 2: [(1, 3)], 3: [(1, 3), (1, 2)], 4: [(1, 2)],
    }

    def contrib(tf, df, dl):
        idf = math.log(1 + (2 * N - 2 * df + 1) / (2 * df + 1))
        num = ts._BM25_NUM_C * tf * T
        den = 1000 * tf * T + ts._BM25_DEN_T * T + ts._BM25_DEN_DL * dl * N
        return idf * num / den

    exp = {
        d: float(Decimal(str(sum(contrib(tf, df, dls[d]) for tf, df in m)))
                 .quantize(Decimal("0.0001"), ROUND_HALF_UP))
        for d, m in tfs.items()
    }
    order = sorted(exp, key=lambda d: (-exp[d], d))
    assert [(r["doc_id"], r["bm25"], r["rank"]) for r in out] == [
        (d, exp[d], i + 1) for i, d in enumerate(order)
    ]
    # two-term doc must score the sum of its single-term contributions;
    # length normalization: same tf of 'common', longer doc scores lower
    assert exp[3] > contrib(1, 3, dls[3]) / 2  # both terms contributed
    assert exp[1] > exp[2]


def test_nb_classifier_margin_and_shared_vocab(spark):
    """NB quality classifier: a pure-Python twin of the floor-log2 bits
    formula pins every column; a document written in the curated seed's
    vocabulary keeps, one in the crawl seed's drops; shared-V smoothing and
    OOV pricing both verified (an all-OOV doc's margin equals n_toks times
    the constant-bits difference)."""
    import math

    from pdf_parser_spark.operators import textstats as T

    # pos seed: doc 0 (doc_id % 7 == 0); neg seed: doc 3 (doc_id % 7 == 3)
    docs = spark.createDataFrame(
        [
            (0, "good clean prose good"),        # pos seed: N_p=4
            (3, "spam spam casino"),             # neg seed: N_n=3
            (1, "good prose"),                   # pos-vocab doc -> keep
            (2, "casino spam"),                  # neg-vocab doc -> drop
            (4, "zz yy"),                        # all-OOV doc
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in T.nb_quality_classifier(docs).collect()}

    # python twin
    cpos = {"good": 2, "clean": 1, "prose": 1}
    cneg = {"spam": 2, "casino": 1}
    n_p, n_n = 4, 3
    v = len(set(cpos) | set(cneg))  # 5 shared vocab

    def bits(n, c):
        return int(math.log2(max((n + v) // (c + 1), 1)))

    def score(tokens):
        bp = sum(bits(n_p, cpos.get(t, 0)) if (t in cpos or t in cneg)
                 else bits(n_p, 0) for t in tokens)
        bn = sum(bits(n_n, cneg.get(t, 0)) if (t in cpos or t in cneg)
                 else bits(n_n, 0) for t in tokens)
        return bp, bn

    for d, toks in [(0, ["good", "clean", "prose", "good"]),
                    (3, ["spam", "spam", "casino"]),
                    (1, ["good", "prose"]), (2, ["casino", "spam"]),
                    (4, ["zz", "yy"])]:
        bp, bn = score(toks)
        r = out[d]
        assert (r["bits_pos"], r["bits_neg"], r["margin"]) == (bp, bn, bn - bp), d
        assert r["label"] == ("keep" if bn - bp >= 0 else "drop"), d

    assert out[1]["label"] == "keep" and out[2]["label"] == "drop"
    # all-OOV doc: margin = n_toks * (oov_bits_neg - oov_bits_pos)
    assert out[4]["n_oov"] == 2
    assert out[4]["margin"] == 2 * (bits(n_n, 0) - bits(n_p, 0))


def test_image_neardup_overlay_pairs_and_banding(spark):
    """Perceptual near-dup: every original/overlay-copy pair is found
    (100% copy recall over a BMP sample — the overlay damages only grid
    row 0 plus at most a small mean drift), damage really is confined to
    the claimed cells for an even-dims image, and byte-identical rasters
    pair at hamming 0 through the banding join."""
    from pdf_parser_spark.operators import multimodal as mm

    # doc_ids that are BMPs (kind = doc_id % 3 == 0), varied dims
    bmp_ids = [0, 3, 6, 9, 12, 24, 48, 96, 288]
    docs = _docs(spark, [(i, "t", "en", "s", 0) for i in bmp_ids])
    pairs = mm.image_neardup(mm.synthetic_media(docs)).collect()

    copy_pairs = {r["cap_a"] for r in pairs if r["is_copy_pair"]}
    assert copy_pairs == set(bmp_ids)  # 100% copy recall
    for r in pairs:
        assert r["hamming"] <= mm.NEARDUP_MAX_HAMMING
        if r["is_copy_pair"]:
            assert r["cap_b"] == r["cap_a"] + mm.IMG_COPY_OFFSET

    # docs 0 and 288 synthesize byte-identical BMPs -> a hamming-0
    # cross-image pair must come through the band join
    flat = {(r["cap_a"], r["cap_b"]): r["hamming"] for r in pairs}
    assert flat.get((0, 288)) == 0

    # direct kernel check: overlay flips bits only in grid row 0 unless
    # the mean moved — for doc 48 (bw=24, bh=8+16%24 -> even dims) pin
    # the exact confined damage
    payload = mm.synthetic_media_payload(48)
    ah_orig = mm._ahash_of(payload)
    copies = {r["cap_id"]: bytes(r["payload"]) for r in
              mm.image_overlay_captures(
                  spark.createDataFrame([(48, bytearray(payload))],
                                        "doc_id long, payload binary")
              ).collect()}
    ah_copy = mm._ahash_of(copies[48 + mm.IMG_COPY_OFFSET])
    diff = [i for i in range(64) if ah_orig[i] != ah_copy[i]]
    assert diff and all(i < 8 for i in diff)  # confined to grid row 0


def test_semdedup_keeps_lowest_centroid_cosine(spark):
    """SemDeDup election: in a duplicate group the member FARTHEST from
    the cluster centroid is kept (the paper's policy), near-centroid
    copies drop; singletons keep themselves; pairs never cross labels;
    cos_rank matches the integer formula twin."""
    from pdf_parser_spark.operators import dedup as dd

    # label 0: three near-identical vectors along e0 with tiny e1 offsets
    # (cos pairs >> threshold); v10 sits far from the centroid direction.
    # label 1: one lone vector (singleton in its own label).
    rows = [
        (0, [1.0, 0.00, 0.0], 0),
        (1, [1.0, 0.01, 0.0], 0),
        (2, [1.0, 0.02, 0.0], 0),
        (10, [0.0, 0.0, 1.0], 0),     # orthogonal: pairs with nobody
        (20, [0.5, 0.5, 0.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r["vec_id"]: r for r in dd.semdedup(emb, threshold=0.9).collect()}
    assert set(out) == {0, 1, 2, 10, 20}

    # the dup group is {0,1,2}; centroid ~ (2.5, 0.03, 1.0)/norm — vector 0
    # (no e1 component) is least aligned ONLY if its centroid cosine is
    # lowest; verify via the integer twin rather than assuming
    q = {vid: [round(v * dd.SEMDEDUP_Q) for v in vec] for vid, vec, _ in rows}
    cent0 = [sum(q[v][d] for v in (0, 1, 2, 10)) for d in range(3)]

    def rank(vid):
        dot = sum(a * b for a, b in zip(q[vid], cent0))
        na2 = sum(a * a for a in q[vid])
        return (-1 if dot < 0 else 1) * (dot * dot // max(na2, 1))

    for vid in (0, 1, 2, 10):
        assert out[vid]["cos_rank"] == rank(vid), vid
    group = [out[v] for v in (0, 1, 2)]
    assert all(g["component"] == 0 for g in group)
    expected_keeper = min((rank(v), v) for v in (0, 1, 2))[1]
    kept = [g["vec_id"] for g in group if g["kept"]]
    assert kept == [expected_keeper]

    # singletons (no pair) keep themselves, component = own id
    assert out[10]["kept"] and out[10]["component"] == 10
    assert out[20]["kept"] and out[20]["component"] == 20


def test_fetcher_lanes_host_exclusive_and_budget(spark):
    """Frontier lanes: every host lands in exactly one lane (hash
    determinism), budgets fold exactly (busy = n_urls * delay summed per
    lane, shares sum to ~10000), and the megahost's lane reports it as
    max_host_ms."""
    from pdf_parser_spark.functions import portable_hash32 as _  # noqa: F401
    from pdf_parser_spark.operators import weburl as wu

    docs = _docs(spark, [(i, "t", "en", f"s{i % 7}", 0) for i in range(60)])
    canon = wu.canonicalize(wu.with_synthetic_urls(docs))
    sched = wu.robots_filter(canon)
    hosts = {
        r["host"]: (r["n"], r["d"]) for r in
        sched.groupBy("host").agg(
            F.count("*").alias("n"), F.first("crawl_delay_ms").alias("d")
        ).collect()
    }
    out = {r["lane"]: r for r in wu.fetcher_lanes(canon).collect()}

    # python twin: lane = md5-hash32(host) % lanes
    import hashlib
    exp = {}
    for h, (n, d) in hosts.items():
        lane = int(hashlib.md5(h.encode()).hexdigest()[:8], 16) % wu.FETCHER_LANES
        e = exp.setdefault(lane, [0, 0, 0, 0])
        e[0] += 1
        e[1] += n
        e[2] += n * d
        e[3] = max(e[3], n * d)
    assert set(out) == set(exp)
    for lane, (nh, nu, busy, mx) in exp.items():
        r = out[lane]
        assert (r["n_hosts"], r["n_urls"], r["busy_ms"], r["max_host_ms"]) == \
            (nh, nu, busy, mx), lane
    total = sum(e[2] for e in exp.values())
    for lane, r in out.items():
        assert r["share_bp"] == 10000 * exp[lane][2] // max(total, 1)
    assert sum(r["share_bp"] for r in out.values()) <= 10000


def test_cross_source_dups_matrix_folds_unordered(spark):
    """Cross-source matrix: (A,B) and (B,A) pairs fold into one
    lexicographic cell, n_docs counts DISTINCT touched documents (a doc in
    two pairs counts once), and within-source pairs land on the diagonal.
    Near-identical texts guarantee band collisions."""
    from pdf_parser_spark.operators import dedup as dd

    t = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(spark, [
        (0, t, "en", "srcA", 0),
        (1, t, "en", "srcB", 0),          # A-B pair
        (2, t, "en", "srcB", 0),          # B-B diagonal + A-B + B-B pairs
        (3, "totally different words here nothing shared", "en", "srcC", 0),
    ])
    out = {(r["source_a"], r["source_b"]): (r["n_pairs"], r["n_docs"])
           for r in dd.cross_source_dups(docs).collect()}
    # identical texts 0,1,2 pair fully: (0,1) AB, (0,2) AB, (1,2) BB
    assert out[("srcA", "srcB")] == (2, 3)   # docs 0,1,2 touched
    assert out[("srcB", "srcB")] == (1, 2)
    assert ("srcC", "srcC") not in out and len(out) == 2


def test_video_neardup_trim_containment(spark):
    """Video near-dup over hand-built P6 streams with genuinely distinct
    frames (the synthetic gradient corpus is a static shot — every frame
    hashes identically, which the containment math handles but cannot
    demonstrate): trimmed reposts contain at exactly 10000 bp with true
    set counts, a one-shared-frame cross pair lands at the 5000 threshold,
    and zero-overlap captures never pair; the P6 kernel matches a hand
    twin."""
    from pdf_parser_spark.operators import multimodal as mm

    def frame(cond):
        # 8x8 P6; pixel (y, x) white iff cond(y, x)
        body = bytes(
            255 if cond(y, x) else 0
            for y in range(8) for x in range(8) for _ in range(3)
        )
        return b"P6\n8 8\n255\n" + body

    fa = frame(lambda y, x: x < 4)   # left half white
    fb = frame(lambda y, x: y < 4)   # top half white
    fc = frame(lambda y, x: (y + x) % 2 == 0)  # checkerboard
    fd = frame(lambda y, x: x >= 4)  # right half white
    assert len({mm._ahash_p6(f) for f in (fa, fb, fc, fd)}) == 4

    vids = spark.createDataFrame(
        [(1, fa + fb + fc), (2, fa + fd)],
        "doc_id long, payload binary",
    )
    out = {(r["cap_a"], r["cap_b"]): r for r in mm.video_neardup(vids).collect()}
    off = mm.VID_COPY_OFFSET
    t1 = out[(1, 1 + off)]
    assert (t1["n_a"], t1["n_b"], t1["n_shared"]) == (3, 2, 2)
    assert t1["contain_bp"] == 10000 and t1["is_trim_pair"]
    t2 = out[(2, 2 + off)]
    assert (t2["n_a"], t2["n_b"], t2["n_shared"]) == (2, 1, 1)
    cross = out[(1, 2)]
    assert (cross["n_shared"], cross["contain_bp"],
            cross["is_trim_pair"]) == (1, 5000, False)
    # trimmed copy of 2 is just fd: zero overlap with video 1 family
    assert (1, 2 + off) not in out and (1 + off, 2 + off) not in out
    # exactly three pairs: the two trim pairs plus the fa-sharing cross
    # ((1+off) = {fb, fc} and (2) = {fa, fd} share nothing)
    assert set(out) == {(1, 1 + off), (2, 2 + off), (1, 2)}

    # kernel twin on the synthetic seeded raster (byte j = (j*11+seed)%256)
    fb9 = mm.make_ppm_seeded(5, 5, 11)
    grays = []
    for i in range(64):
        sx, sy = (i % 8) * 5 // 8, (i // 8) * 5 // 8
        o = 3 * (sy * 5 + sx)
        grays.append(sum(((o + k) * 11 + 11) % 256 for k in range(3)) // 3)
    mn = sum(grays) // 64
    assert mm._ahash_p6(fb9) == "".join("1" if v > mn else "0" for v in grays)

    # synthetic corpus sanity: every trim pair contains at 10000
    docs = _docs(spark, [(i, "t", "en", "s", 0) for i in (0, 1, 9, 14)])
    sout = [r for r in mm.video_neardup(mm.synthetic_video(docs)).collect()
            if r["is_trim_pair"]]
    assert {r["cap_a"] for r in sout} == {0, 1, 9, 14}
    assert all(r["contain_bp"] == 10000 for r in sout)


def test_filter_agreement_cells_and_shares(spark):
    """Agreement matrix: cells equal the brute cross of the two verdicts
    computed independently, shares are exact integer bp of the doc count."""
    from pdf_parser_spark.operators import textstats as T

    docs = _docs(spark, [(i, ("good prose " * 30) if i % 2 == 0
                          else "#### ### ##", "en", "s", 0)
                         for i in range(14)])
    nb = {r["doc_id"]: r["label"]
          for r in T.nb_quality_classifier(docs).collect()}
    gate = {r["doc_id"]: r["passed"] for r in T.quality_gate(docs).collect()}
    from collections import Counter
    exp = Counter((nb[d], gate[d]) for d in nb)
    out = {(r["nb_label"], r["gate_passed"]): (r["n_docs"], r["share_bp"])
           for r in T.filter_agreement(docs).collect()}
    assert {k: v[0] for k, v in out.items()} == dict(exp)
    total = sum(exp.values())
    for k, (n, bp) in out.items():
        assert bp == 10000 * n // total


def test_global_shuffle_deterministic_and_seeded(spark):
    """Global shuffle: pure function of (doc_id, seed) — two runs agree
    exactly; a different seed produces a different permutation; positions
    within each shard are dense 0..n-1; no document is lost."""
    import hashlib

    from pdf_parser_spark.operators import curation as cu

    docs = _docs(spark, [(i, "t", "en", "s", 0) for i in range(40)])
    a = {r["doc_id"]: (r["shard"], r["pos"])
         for r in cu.global_shuffle(docs).collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"])
         for r in cu.global_shuffle(docs).collect()}
    assert a == b and len(a) == 40

    # python twin of shard + rank
    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
    hs = {d: h32(f"{cu.SHUFFLE_SEED}:{d}") for d in range(40)}
    for d, (shard, pos) in a.items():
        assert shard == hs[d] % cu.SHUFFLE_SHARDS
        peers = sorted((hs[x], x) for x in range(40)
                       if hs[x] % cu.SHUFFLE_SHARDS == shard)
        assert pos == peers.index((hs[d], d))
    # dense positions per shard
    from collections import defaultdict
    by_shard = defaultdict(list)
    for d, (shard, pos) in a.items():
        by_shard[shard].append(pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))

    c = {r["doc_id"]: (r["shard"], r["pos"])
         for r in cu.global_shuffle(docs, seed="ep1").collect()}
    assert c != a  # a new epoch seed reshuffles


def test_pack_sequences_tiles_and_matches_brute_force(spark):
    """Concat-and-split packing: every (shard, seq) except the shard's last
    tiles [0, SEQ_LEN) exactly with contiguous non-overlapping fragments;
    each doc's fragments cover [0, n_tok) in order; rows equal a brute-force
    Python pack over the same shuffle order; a long doc spans sequences."""
    import hashlib
    from collections import defaultdict

    from pdf_parser_spark.operators import curation as cu

    # varied lengths incl. one doc much longer than SEQ_LEN and one empty
    rows = []
    for i in range(60):
        n_words = 1 + (i * 7) % 50 if i != 13 else 3 * cu.SEQ_LEN
        rows.append((i, " ".join(f"w{j}" for j in range(n_words)),
                     "en", "s", 0))
    rows.append((99, "   ", "en", "s", 0))  # whitespace-only: packs nothing
    docs = _docs(spark, rows)
    got = [tuple(r) for r in cu.pack_sequences(docs)
           .select("shard", "seq_id", "seq_slot_start", "doc_id",
                   "doc_tok_start", "doc_tok_end", "n_toks").collect()]

    # brute-force twin: shuffle order, then a running cursor per shard
    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    n_tok = {i: (1 + (i * 7) % 50 if i != 13 else 3 * cu.SEQ_LEN) + 1
             for i in range(60)}  # +1 EOS; doc 99 excluded
    by_shard = defaultdict(list)
    for d in range(60):
        h = h32(f"{cu.SHUFFLE_SEED}:{d}")
        by_shard[h % cu.SHUFFLE_SHARDS].append((h, d))
    want = []
    L = cu.SEQ_LEN
    for shard, members in by_shard.items():
        off = 0
        for _, d in sorted(members):
            for seq in range(off // L, (off + n_tok[d] - 1) // L + 1):
                s0 = max(0, seq * L - off)
                s1 = min(n_tok[d], (seq + 1) * L - off)
                want.append((shard, seq, off + s0 - seq * L, d, s0, s1,
                             s1 - s0))
            off += n_tok[d]
    assert sorted(got) == sorted(want)
    assert 99 not in {r[3] for r in got}
    assert len({r[1] for r in got if r[3] == 13}) >= 3  # long doc spans

    # tiling invariant: every non-final sequence of a shard sums to L and
    # its fragments are contiguous from slot 0
    frags = defaultdict(list)
    last_seq = defaultdict(int)
    for shard, seq, slot, d, s0, s1, n in got:
        frags[(shard, seq)].append((slot, n))
        last_seq[shard] = max(last_seq[shard], seq)
    for (shard, seq), fs in frags.items():
        fs.sort()
        assert fs[0][0] == 0
        for (a0, an), (b0, _) in zip(fs, fs[1:]):
            assert a0 + an == b0  # contiguous, no overlap, no gap
        total = sum(n for _, n in fs)
        assert total == L if seq < last_seq[shard] else total <= L

    # per-doc coverage: fragments reassemble [0, n_tok) in seq order
    by_doc = defaultdict(list)
    for shard, seq, slot, d, s0, s1, n in got:
        by_doc[d].append((seq, s0, s1))
    for d, spans in by_doc.items():
        spans.sort()
        assert spans[0][1] == 0 and spans[-1][2] == n_tok[d]
        for (_, _, e0), (_, b1, _) in zip(spans, spans[1:]):
            assert e0 == b1


def test_packing_stats_waste_and_split_arithmetic(spark):
    """packing_stats agrees with pack_sequences: n_seqs = max seq_id + 1,
    tail waste = n_seqs*L - total, split docs = docs with >1 sequence."""
    from collections import defaultdict

    from pdf_parser_spark.operators import curation as cu

    docs = _docs(spark, [
        (i, " ".join(f"w{j}" for j in range(1 + (i * 11) % 40)), "en", "s", 0)
        for i in range(50)
    ])
    packed = cu.pack_sequences(docs).collect()
    stats = {r["shard"]: r for r in cu.packing_stats(docs).collect()}
    L = cu.SEQ_LEN

    seqs = defaultdict(set)
    toks = defaultdict(int)
    doc_seqs = defaultdict(set)
    for r in packed:
        seqs[r["shard"]].add(r["seq_id"])
        toks[r["shard"]] += r["n_toks"]
        doc_seqs[(r["shard"], r["doc_id"])].add(r["seq_id"])
    assert set(stats) == set(seqs)
    for shard, s in stats.items():
        assert s["n_seqs"] == max(seqs[shard]) + 1 == len(seqs[shard])
        assert s["total_toks"] == toks[shard]
        assert s["tail_waste_toks"] == s["n_seqs"] * L - toks[shard]
        assert 0 <= s["tail_waste_toks"] < L
        assert s["waste_bp"] == (10000 * s["tail_waste_toks"]) // (s["n_seqs"] * L)
        assert s["n_split_docs"] == sum(
            1 for (sh, _), ss in doc_seqs.items()
            if sh == shard and len(ss) > 1)
        assert s["n_docs"] == sum(1 for (sh, _) in doc_seqs if sh == shard)


def test_decontaminate_fuzzy_threshold_vs_exact_ngram(spark):
    """Fuzzy decontamination requires near-copy similarity: a doc sharing
    exactly ONE trigram with the benchmark is flagged by the exact face but
    NOT by the fuzzy face; an append-edited near-copy is flagged by both,
    with jaccard_bp pinned by a Python shingle twin; a disjoint doc by
    neither.  Self-copies score 10000."""
    from pdf_parser_spark.operators import curation as cu

    bench_text = " ".join(f"bword{j}" for j in range(30))
    near_copy = bench_text + " tail1 tail2 tail3 tail4 tail5"
    one_trigram = ("totally different opening bword0 bword1 bword2 "
                   "and then unrelated closing words here")
    disjoint = "nothing here overlaps with the benchmark at all ever"
    docs = _docs(spark, [
        (1, near_copy, "en", "s", 0),
        (2, one_trigram, "en", "s", 0),
        (3, disjoint, "en", "s", 0),
        (4, bench_text, "en", "s", 0),
    ])
    bench = spark.createDataFrame(
        [(100, bench_text)], "bench_id long, text string")

    fuzzy = {(r["doc_id"], r["bench_id"]): r
             for r in cu.decontaminate_fuzzy(docs, bench).collect()}
    assert (4, 100) in fuzzy and fuzzy[(4, 100)]["jaccard_bp"] == 10000
    assert (1, 100) in fuzzy
    # python twin of the jaccard: shingle sets of near_copy vs bench
    def sh(t):
        w = t.split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
    inter = len(sh(near_copy) & sh(bench_text))
    union = len(sh(near_copy) | sh(bench_text))
    assert fuzzy[(1, 100)]["jaccard_bp"] == (10000 * inter) // union >= 5000
    assert all(d != 2 for d, _ in fuzzy) and all(d != 3 for d, _ in fuzzy)

    # the exact-ngram face DOES flag the one-trigram doc (its documented
    # any-hit rule) — the false-positive class the fuzzy face suppresses
    exact = {r["doc_id"]: r for r in cu.decontaminate(
        docs, bench.select(F.col("text").alias("snippet"))).collect()}
    assert exact[2]["contaminated"] and exact[2]["n_hits"] == 1
    assert exact[1]["contaminated"] and not exact[3]["contaminated"]


def test_release_manifest_composes_build_then_pack(spark):
    """release_manifest == pack_sequences over exactly corpus_build's
    survivor set, computed independently stage by stage."""
    from pdf_parser_spark.operators import curation as cu

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    surv_ids = {r["doc_id"] for r in cu.corpus_build(docs).collect()}
    manual = cu.pack_sequences(
        docs.where(F.col("doc_id").isin(list(surv_ids))))
    got = cu.release_manifest(docs)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, manual.collect()))
    assert {r["doc_id"] for r in got.select("doc_id").distinct().collect()
            } <= surv_ids


def test_budget_select_quality_first_fill_and_boundary(spark):
    """budget_select == a brute-force Python fill over (quality desc, hash,
    doc_id) order: all kept docs start before the budget line, higher
    quality always wins over lower, the crossing doc is kept (stated
    overshoot), and within the boundary bucket the hash order decides."""
    import hashlib

    from pdf_parser_spark.operators import curation as cu
    from pdf_parser_spark.operators.textstats import quality_score

    docs = _docs(spark, [
        (i, " ".join(f"w{j}" for j in range((i * 13) % 60 + 5)), "en", "s", 0)
        for i in range(60)
    ])
    budget = 400
    got = {r["doc_id"]: r for r in
           cu.budget_select(docs, budget_tokens=budget).collect()}
    q = {r["doc_id"]: (int(round(r["quality"] * 10000)), r["n_tokens"])
         for r in quality_score(docs).collect()}

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    order = sorted(q, key=lambda d: (-q[d][0],
                                     h32(f"{cu.BUDGET_SEED}:{d}"), d))
    cum, want_kept = 0, set()
    for d in order:
        if cum < budget:
            want_kept.add(d)
        cum += q[d][1]
    assert {d for d, r in got.items() if r["kept"]} == want_kept
    assert len(got) == 60  # audit face: every doc present
    for d, r in got.items():
        assert (r["quality_bp"], r["n_tokens"]) == q[d]
    # overshoot is at most the crossing doc's own tokens
    kept_toks = sum(q[d][1] for d in want_kept)
    last = max(want_kept, key=lambda d: order.index(d))
    assert kept_toks - q[last][1] < budget <= kept_toks


def test_curriculum_order_tiers_and_dense_positions(spark):
    """curriculum_order: tier agrees with quality_tiers, positions are
    dense 0..n-1 per (tier, shard), the within-group order is the shuffle
    hash order, and no document is lost."""
    import hashlib
    from collections import defaultdict

    from pdf_parser_spark.operators import curation as cu
    from pdf_parser_spark.operators.textstats import quality_score

    docs = _docs(spark, [
        (i, " ".join(f"w{j}" for j in range((i * 17) % 80 + 3)), "en", "s", 0)
        for i in range(70)
    ])
    got = {r["doc_id"]: (r["tier"], r["shard"], r["pos"])
           for r in cu.curriculum_order(docs).collect()}
    assert len(got) == 70
    want_tier = {r["doc_id"]: r["tier"] for r in cu.quality_tiers(
        quality_score(docs).select("doc_id", "quality")).collect()}
    assert {d: t for d, (t, _, _) in got.items()} == want_tier

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    groups = defaultdict(list)
    for d, (t, sh, pos) in got.items():
        assert sh == h32(f"{cu.SHUFFLE_SEED}:{d}") % cu.SHUFFLE_SHARDS
        groups[(t, sh)].append((pos, d))
    for (t, sh), members in groups.items():
        members.sort()
        assert [p for p, _ in members] == list(range(len(members)))
        by_hash = sorted(members,
                         key=lambda pd: (h32(f"{cu.SHUFFLE_SEED}:{pd[1]}"),
                                         pd[1]))
        assert members == by_hash


def test_license_precedence_most_restrictive_wins(spark):
    """Every precedence collision resolves to the MORE restrictive tag:
    doc 0 carries all four footers -> all-rights-reserved; by-sa beats by;
    by beats public-domain only when by is present; clean docs tag none;
    rollup shares sum to <= 10000 bp with exact integer arithmetic."""
    from pdf_parser_spark.operators import curation as cu

    # moduli: SA=9, BY=7, PD=11, ARR=5
    docs = _docs(spark, [
        (0, "ten words of body text here for the doc zero", "en", "s", 0),
        (63, "body", "en", "s", 0),     # 63 % 9 == 0 and % 7 == 0 -> by-sa
        (7, "body", "en", "s", 0),      # by only
        (77, "body", "en", "s", 0),     # 7 and 11 -> by beats public-domain
        (11, "body", "en", "s", 0),     # public-domain only
        (5, "body", "en", "s", 0),      # all-rights-reserved
        (1, "body", "en", "s", 0),      # none
    ])
    tags = {r["doc_id"]: r["license"] for r in cu.license_tags(
        cu.with_license_lines(docs)).collect()}
    assert tags == {0: "all-rights-reserved", 63: "cc-by-sa", 7: "cc-by",
                    77: "cc-by", 11: "public-domain",
                    5: "all-rights-reserved", 1: "none"}

    roll = {r["license"]: r for r in cu.license_rollup(docs).collect()}
    total = sum(r["n_tokens"] for r in roll.values())
    for r in roll.values():
        assert r["token_share_bp"] == (10000 * r["n_tokens"]) // total
    assert sum(r["n_docs"] for r in roll.values()) == 7


def test_epoch_plan_matches_resampler_arithmetic(spark):
    """epoch_plan shares mixture_resample's e_bp rule exactly: for an
    engineered corpus, epochs_bp == budget*w div src_tokens, full_epochs
    is its 10000-div, and the healthy bound fires only past 4 epochs."""
    from pdf_parser_spark.operators import curation as cu

    # src0: 10 tokens total, weight 4000 -> with budget 30000: e_bp = 12000*...
    docs = _docs(spark, [
        (1, "a b c d e", "en", "src0", 0),      # 5 tokens
        (2, "a b c d e", "en", "src0", 0),      # 5 tokens
        (3, " ".join(["w"] * 3000), "en", "src1", 0),  # big enough that
        # e_bp = 30000*3000/3000 = 30000 bp (3 epochs) stays healthy
        (4, " ".join(["w"] * 2), "en", "src2", 0),   # tiny -> huge epochs
        (5, " ".join(["w"] * 50), "en", "src3", 0),
    ])
    plan = {r["source"]: r for r in cu.epoch_plan(docs).collect()}
    w = cu.MIXTURE_WEIGHTS
    b = cu.EPOCH_BUDGET_TOKENS
    avail = {"src0": 10, "src1": 3000, "src2": 2, "src3": 50}
    for s, r in plan.items():
        e_bp = (b * w[s]) // avail[s]
        assert r["src_tokens"] == avail[s]
        assert r["epochs_bp"] == e_bp
        assert r["full_epochs"] == e_bp // 10000
        assert r["target_tokens"] == (b * w[s]) // 10000
        assert r["exceeds_healthy"] == (e_bp > cu.EPOCH_MAX_HEALTHY_BP)
    # src2 at 2 tokens against a 30000*0.2 target is wildly over-repeated
    assert plan["src2"]["exceeds_healthy"]
    assert not plan["src1"]["exceeds_healthy"]


def test_contamination_report_exact_vs_fuzzy_signatures(spark):
    """The report separates the idiom-collision signature (exact hit, no
    fuzzy hit) from the real-leak signature (both): one doc quotes a single
    trigram of bench item 0, another is a near-copy of it; an untouched
    bench item reports zeros; the bench doc itself never counts."""
    from pdf_parser_spark.operators import curation as cu

    bench_text = " ".join(f"bw{j}" for j in range(30))
    docs = _docs(spark, [
        (0, bench_text, "en", "s", 0),                      # bench item
        (37, "nothing shared with anything here at all ok", "en", "s", 0),
        # near-copy sharing exactly 1 of 4 MinHash bands with item 0 (the
        # 3-tail variant deterministically flips every band minimum — LSH
        # recall is probabilistic and this fixture pins a true collision)
        (1, bench_text + " tail1 tail2", "en", "s", 0),
        (2, "opening words bw0 bw1 bw2 closing words here", "en", "s", 0),
    ])
    rep = {r["bench_id"]: r
           for r in cu.contamination_report(docs).collect()}
    assert set(rep) == {0, 37}
    # item 0: docs 1 (near-copy -> exact AND fuzzy) and 2 (one trigram ->
    # exact only); the snippet is the first 8 words, which doc 2 quotes
    assert rep[0]["n_exact_docs"] == 2
    assert rep[0]["n_fuzzy_docs"] == 1
    assert rep[37]["n_exact_docs"] == 0 and rep[37]["n_fuzzy_docs"] == 0


def test_cms_never_undercounts_and_collisions_overcount(spark):
    """CMS one-sided guarantee on an engineered stream: every estimate >=
    the true count; a python twin of the d x w sketch reproduces every
    estimate exactly; a forced collision (tiny w makes the pigeonhole
    certain) shows overcount > 0 somewhere while min-over-rows keeps the
    top term exact or overcounted, never under."""
    import hashlib

    from pdf_parser_spark.operators import textstats as ts

    # 40 distinct terms over 64 buckets x 4 rows; frequencies 1..40
    rows = []
    did = 0
    for i in range(40):
        rows.append((did, " ".join([f"term{i}"] * (i + 1)), "en", "s", 0))
        did += 1
    docs = _docs(spark, rows)
    got = {r["term"]: r for r in ts.cms_heavy_hitters(docs).collect()}
    assert len(got) == ts.CMS_TOPK

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    true = {f"term{i}": i + 1 for i in range(40)}
    n_total = sum(true.values())
    cells = {}
    for t, c in true.items():
        for i, (a, b) in enumerate(ts.CMS_PARAMS):
            bkt = (a * h32(t) + b) % (1 << 32) % ts.CMS_W
            cells[(i, bkt)] = cells.get((i, bkt), 0) + c
    for t, r in got.items():
        est = min(
            cells[(i, (a * h32(t) + b) % (1 << 32) % ts.CMS_W)]
            for i, (a, b) in enumerate(ts.CMS_PARAMS))
        assert r["cms_est"] == est
        assert r["true_count"] == true[t]
        assert r["overcount"] == est - true[t] >= 0
        assert r["within_eps"] == (
            (est - true[t]) * ts.CMS_W <= ts.CMS_EPS_NUM * n_total)


def test_holdout_split_exact_k_and_minimal_churn(spark):
    """Exactly k holdout docs per source; membership is the k smallest
    (seed, doc_id) hashes (python twin); growing the corpus displaces at
    most as many members as new docs that hash below the old boundary —
    existing members never reshuffle arbitrarily."""
    import hashlib
    from collections import defaultdict

    from pdf_parser_spark.operators import curation as cu

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def hold(rows):
        out = {r["doc_id"]: r["split"] for r in cu.holdout_split(
            _docs(spark, rows)).collect()}
        return {d for d, s in out.items() if s == "holdout"}, out

    rows = [(i, "t", "en", f"src{i % 3}", 0) for i in range(60)]
    got, allsplit = hold(rows)
    assert len(allsplit) == 60
    by_src = defaultdict(list)
    for i in range(60):
        by_src[f"src{i % 3}"].append(
            (h32(f"{cu.HOLDOUT_SEED}:{i}"), i))
    want = set()
    for src, members in by_src.items():
        want |= {d for _, d in sorted(members)[:cu.HOLDOUT_K]}
    assert got == want
    # minimal churn: add 30 docs; surviving members = old members whose
    # hash still ranks in the top k — never an unrelated reshuffle
    rows2 = rows + [(100 + i, "t", "en", f"src{i % 3}", 0) for i in range(30)]
    got2, _ = hold(rows2)
    for src, members in by_src.items():
        old_k = {d for _, d in sorted(members)[:cu.HOLDOUT_K]}
        new2 = [(h32(f"{cu.HOLDOUT_SEED}:{d}"), d)
                for d in range(100, 130) if f"src{(d - 100) % 3}" == src]
        new_k = {d for _, d in sorted(members + new2)[:cu.HOLDOUT_K]}
        assert new_k == {d for d in got2
                         if (d % 3 if d < 100 else (d - 100) % 3)
                         == int(src[-1])}
        # every lost old member is displaced by a new doc, one-for-one —
        # surviving membership is rank-stable, never reshuffled
        lost = old_k - new_k
        gained = {d for d in new_k if d >= 100}
        assert len(lost) == len(gained)
        assert old_k - lost <= new_k


def test_bm25_source_mrr_finds_planted_unique_terms(spark):
    """A doc whose 3rd/5th words are corpus-unique must rank itself #1
    (rr 10000, hit@1); a doc whose query words appear verbatim in many
    docs ranks lower but is always present; faces share one scoring chain
    so t_bm25's ranking invariants apply."""
    from pdf_parser_spark.operators import textstats as ts

    common = "shared shared shared shared shared shared"
    docs = _docs(spark, [
        # doc 0: words 3/5 are 'uniqA'/'uniqB' -> corpus-unique
        (0, "w1 w2 uniqA w4 uniqB w6 w7", "en", "s", 0),
        # doc 31: words 3/5 are 'shared' twice -> dedup to one common term
        (31, "x1 x2 shared x4 shared x6", "en", "s", 0),
        (1, common, "en", "s", 0),
        (2, common + " extra words", "en", "s", 0),
        (3, "totally unrelated filler content here", "en", "s", 0),
    ])
    got = {r["query_id"]: r for r in ts.bm25_source_mrr(docs).collect()}
    assert set(got) == {0, 31}
    assert got[0]["target_rank"] == 1 and got[0]["rr_bp"] == 10000
    assert got[0]["hit_at_1"] and got[0]["hit_at_5"]
    # doc 31 competes with docs 1/2 that are denser in 'shared'; it must
    # still appear, with rr_bp = 10000 div rank exactly
    r31 = got[31]
    assert r31["rr_bp"] == 10000 // r31["target_rank"]
    assert r31["hit_at_1"] == (r31["target_rank"] == 1)
    assert r31["hit_at_5"] == (r31["target_rank"] <= 5)


def test_char_entropy_flags_junk_not_prose(spark):
    """Entropy pinned against a python twin: repeated-char filler flags
    low, prose doesn't, a uniform 4-char alphabet lands at exactly 2000
    milli-bits, and a single-char doc at exactly 0."""
    import math
    from collections import Counter

    from pdf_parser_spark.operators import textstats as ts

    rows = [
        (1, "aaaaaaaaaaaaaaaaaaaaaaaa", "en", "s", 0),
        (2, "the quick brown fox jumps over the lazy dog", "en", "s", 0),
        (3, "abcdabcdabcdabcd", "en", "s", 0),   # uniform 4 chars -> H = 2
        (4, "z", "en", "s", 0),                  # single char -> H = 0
    ]
    got = {r["doc_id"]: r for r in ts.char_entropy(
        _docs(spark, rows)).collect()}

    for did, text, *_ in [(r[0], r[1]) for r in rows]:
        c = Counter(text)
        n = sum(c.values())
        h = math.log2(n) - sum(v * math.log2(v) for v in c.values()) / n
        r = got[did]
        assert r["entropy_milli"] == math.floor(1000 * h)
        assert r["n_chars_counted"] == n
        assert r["distinct_chars"] == len(c)
        assert r["is_low_entropy"] == (r["entropy_milli"]
                                       < ts.ENTROPY_LOW_MILLI)
    assert got[1]["is_low_entropy"] and got[4]["entropy_milli"] == 0
    assert got[3]["entropy_milli"] == 2000
    assert not got[2]["is_low_entropy"]


def test_unigram_tokenizer_em_fit_and_viterbi_apply(spark):
    """Unigram LM: the fit keeps every seen char + top multi-char pieces
    and learns the repeated trigram; apply totals equal a python Viterbi
    twin per word (including an unknown-char word at UNK cost); the
    learned segmentation beats pure-char segmentation on the dominant
    word."""
    from pdf_parser_spark.operators import textstats as ts

    docs = _docs(spark, [
        (i, "banana banana banana split", "en", "s", 0) for i in range(6)
    ] + [(99, "qÿerty", "en", "s", 0)])  # word with a rare char

    vocab_df = ts.unigram_fit_local(docs)
    vocab = {r["piece"]: r["cost_milli"] for r in vocab_df.collect()}
    chars = set("banana split qÿerty".replace(" ", ""))
    assert chars <= set(vocab)  # total coverage: every char is a piece
    assert any(len(p) > 1 for p in vocab)  # multi-char pieces learned
    assert len(vocab) <= ts.UNIGRAM_VOCAB_SIZE + len(chars)

    def viterbi(w, costs):
        INF = 1 << 60
        dp = [0] + [INF] * len(w)
        for i in range(1, len(w) + 1):
            for ln in range(1, min(ts.UNIGRAM_MAX_PIECE, i) + 1):
                p = w[i - ln:i]
                if ln == 1:
                    cm = costs.get(p, ts.UNIGRAM_UNK_MILLI)
                elif p in costs:
                    cm = costs[p]
                else:
                    continue
                dp[i] = min(dp[i], dp[i - ln] + cm * 1000 + 1)
        return dp[len(w)]

    got = {r["doc_id"]: r for r in ts.unigram_apply(docs, vocab_df).collect()}
    for did, text in [(0, "banana banana banana split"),
                      (99, "qÿerty")]:
        units = [viterbi(w, vocab) for w in text.lower().split()]
        assert got[did]["n_words"] == len(units)
        assert got[did]["n_pieces"] == sum(u % 1000 for u in units)
        assert got[did]["cost_milli"] == sum(u // 1000 for u in units)
    # the dominant word segments into fewer pieces than its length
    banana_units = viterbi("banana", vocab)
    assert banana_units % 1000 < len("banana")

    # fit determinism: a second run returns identical rows
    again = {r["piece"]: r["cost_milli"]
             for r in ts.unigram_fit_local(docs).collect()}
    assert again == vocab


def test_unigram_fertility_rolls_up_apply_exactly(spark):
    """Fertility == the lang rollup of unigram_apply, with exact integer
    bp arithmetic."""
    from collections import defaultdict

    from pdf_parser_spark.operators import textstats as ts

    docs = _docs(spark, [
        (1, "banana banana split", "en", "s", 0),
        (2, "banana bandana", "en", "s", 0),
        (3, "ba na na", "es", "s", 0),
    ])
    vocab = ts.unigram_fit_local(docs)
    per_doc = {r["doc_id"]: r for r in ts.unigram_apply(docs, vocab).collect()}
    fert = {r["lang"]: r for r in ts.unigram_fertility(docs, vocab).collect()}
    langs = {1: "en", 2: "en", 3: "es"}
    agg = defaultdict(lambda: [0, 0])
    for d, r in per_doc.items():
        agg[langs[d]][0] += r["n_words"]
        agg[langs[d]][1] += r["n_pieces"]
    for lang, (nw, np_) in agg.items():
        assert fert[lang]["n_words"] == nw
        assert fert[lang]["n_pieces"] == np_
        assert fert[lang]["pieces_per_word_bp"] == (10000 * np_) // nw


def test_dedup_survivorship_cross_source_accounting(spark):
    """Engineered clusters: {1,2,3} spans srcA/srcB with keeper 1 in srcA —
    srcB's two members are both dropped cross-source; {10,11} inside srcC
    drops within-source; isolated docs never appear."""
    from pdf_parser_spark.operators import dedup as dd

    dup1 = " ".join(f"w{j}" for j in range(20))
    dup2 = " ".join(f"v{j}" for j in range(20))
    docs = _docs(spark, [
        (1, dup1, "en", "srcA", 0),
        (2, dup1, "en", "srcB", 0),
        (3, dup1, "en", "srcB", 0),
        (10, dup2, "en", "srcC", 0),
        (11, dup2, "en", "srcC", 0),
        (50, "isolated unique content here totally alone", "en", "srcA", 0),
    ])
    out = {r["source"]: r for r in dd.dedup_survivorship(docs).collect()}
    assert set(out) == {"srcA", "srcB", "srcC"}
    a, b, c = out["srcA"], out["srcB"], out["srcC"]
    assert (a["n_members"], a["n_keepers"], a["n_dropped"],
            a["n_cross_source_lost"]) == (1, 1, 0, 0)
    assert (b["n_members"], b["n_keepers"], b["n_dropped"],
            b["n_cross_source_lost"]) == (2, 0, 2, 2)
    assert (c["n_members"], c["n_keepers"], c["n_dropped"],
            c["n_cross_source_lost"]) == (2, 1, 1, 0)


def test_corpus_funnel_monotone_and_matches_stages(spark):
    """Funnel counts are monotone non-increasing after every stage, the
    sampled row equals corpus_build's survivor count, raw retention is
    10000 bp, and bp arithmetic is exact."""
    from pdf_parser_spark.operators import curation as cu

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    funnel = {r["stage"]: r for r in cu.corpus_funnel(docs).collect()}
    assert [funnel[s]["stage_idx"] for s in
            ["raw", "gated", "deduped", "clean", "sampled"]] == [0, 1, 2, 3, 4]
    seq = [funnel[s] for s in ["raw", "gated", "deduped", "clean", "sampled"]]
    for a, b in zip(seq, seq[1:]):
        assert b["n_docs"] <= a["n_docs"] and b["n_tokens"] <= a["n_tokens"]
    raw = funnel["raw"]
    assert raw["docs_retained_bp"] == raw["tokens_retained_bp"] == 10000
    for r in seq:
        assert r["docs_retained_bp"] == (10000 * r["n_docs"]) // raw["n_docs"]
        assert r["tokens_retained_bp"] == (
            10000 * r["n_tokens"]) // raw["n_tokens"]
    built = cu.corpus_build(docs)
    assert funnel["sampled"]["n_docs"] == built.count()


def test_len_quality_assoc_exact_moments(spark):
    """Moments pinned against a python twin on an engineered corpus where
    longer docs deliberately score higher (positive covariance) and on a
    reversed corpus (negative)."""
    from pdf_parser_spark.operators import textstats as ts
    from pdf_parser_spark.operators.textstats import quality_score

    def build(rows):
        docs = _docs(spark, rows)
        got = ts.len_quality_assoc(docs).collect()[0]
        qs = [(r["n_tokens"], int(round(r["quality"] * 10000)))
              for r in quality_score(docs).collect()]
        n = len(qs)
        sx = sum(x for x, _ in qs); sy = sum(y for _, y in qs)
        sxy = sum(x * y for x, y in qs)
        assert got["n_docs"] == n and got["sum_x"] == sx
        assert got["sum_y"] == sy and got["sum_xy"] == sxy
        assert got["sum_x2"] == sum(x * x for x, _ in qs)
        assert got["sum_y2"] == sum(y * y for _, y in qs)
        assert got["cov_num"] == n * sxy - sx * sy
        assert got["cov_positive"] == (got["cov_num"] > 0)
        return got

    # longer docs richer in stopwords -> quality rises with length
    pos = build([(i, " ".join((["the", "of", "and", "word"] * (i + 1))[: 4 * (i + 1)]),
                  "en", "s", 0) for i in range(8)])
    assert pos["cov_positive"]
    # longer docs = pure filler, short docs = stopword-dense
    neg = build([
        (0, "the of and to in is", "en", "s", 0),
        (1, "the of and in", "en", "s", 0),
        (2, " ".join(["zz"] * 60), "en", "s", 0),
        (3, " ".join(["qq"] * 80), "en", "s", 0),
    ])
    assert not neg["cov_positive"]


def test_gate_impact_sole_blocker_accounting(spark):
    """Engineered docs: one fails ONLY no_stopwords (sole blocker), one
    fails no_stopwords AND word_len (sole for neither), clean docs count
    nowhere, and never-firing rules report zero rows — all with exact
    token-bp arithmetic."""
    from pdf_parser_spark.operators import textstats as ts

    # all docs sit above GATE_MIN_TOKENS (50) so only the targeted rules fire
    clean = " ".join(["the quick brown fox jumps over a lazy dog"] * 8)
    no_stop = " ".join(f"word{j:02d}" for j in range(60))  # 6-char words keep
    # mean_wl inside the band: ONLY no_stopwords fires (sole blocker)
    both = " ".join(["x" * 40] * 60)  # word_len AND no_stopwords
    docs = _docs(spark, [
        (1, clean, "en", "s", 0),
        (2, no_stop, "en", "s", 0),
        (3, both, "en", "s", 0),
    ])
    out = {r["rule"]: r for r in ts.gate_impact(docs).collect()}
    assert set(out) == set(ts.GATE_RULE_NAMES)
    ns, wl = out["no_stopwords"], out["word_len"]
    assert ns["n_docs_failing"] == 2 and ns["n_sole_blocker"] == 1
    assert wl["n_docs_failing"] == 1 and wl["n_sole_blocker"] == 0
    total = sum(len(t.split()) for t in (clean, no_stop, both))
    assert ns["tokens_failing"] == 120
    assert ns["tokens_bp"] == (10000 * 120) // total
    for r in ("hash_symbols", "ellipsis_lines", "bullet_lines",
              "too_few_tokens", "too_many_tokens"):
        assert out[r]["n_docs_failing"] == 0 and out[r]["tokens_bp"] == 0


def test_host_triangles_clustering(spark):
    """Triangle pins: a 3-cycle gives every member one triangle (cc 10000
    at degree 2, 3333 at the degree-3 cut vertex), a 4-clique gives every
    member C(3,2)=3 triangles at cc exactly 10000, a pendant and an
    isolated host read (deg, 0, 0), and parallel page edges fold before
    counting (the A-B double edge changes nothing)."""
    from pdf_parser_spark.operators import linkgraph as lg

    urls = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (3, "d"), (4, "e"),
         (5, "f"), (6, "g"), (7, "h"), (8, "i")],
        "doc_id long, host string")
    edges = spark.createDataFrame(
        # triangle a-b-c (with a parallel a->b page edge), pendant c-d
        [(0, 1), (0, 1), (1, 2), (2, 0), (2, 3)]
        # 4-clique f,g,h,i (one direction per pair; undirected fold)
        + [(5, 6), (5, 7), (5, 8), (6, 7), (6, 8), (7, 8)],
        "src long, dst long")
    got = {r["host"]: (r["degree"], r["n_triangles"], r["cc_bp"])
           for r in lg.host_triangles(edges, urls).collect()}
    assert got["a"] == (2, 1, 10000) and got["b"] == (2, 1, 10000)
    assert got["c"] == (3, 1, 3333)          # 20000*1 // (3*2)
    assert got["d"] == (1, 0, 0)
    assert got["e"] == (0, 0, 0)             # zero-filled isolated host
    for h in "fghi":
        assert got[h] == (3, 3, 10000)       # clique: C(3,2) triangles
    assert len(got) == 9


def test_dup_rate_trend_partition(spark):
    """Trend pins: every doc lands in exactly ONE of new/within/prior (the
    three counts sum to n_docs per crawl), extra copies in the earliest
    crawl are within-dups, any copy in a later crawl is a prior-dup,
    whitespace/case normalization folds before fingerprinting, and an
    empty crawl zero-fills."""
    from pdf_parser_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        # crawl = doc_id % 4
        [(0, "x"), (4, "x"),          # crawl 0: first + within-dup
         (1, "x"), (9, "x"),          # crawl 1: both prior-dups
         (5, "  X "),                 # crawl 1: normalizes to "x" -> prior
         (2, "y"),                    # crawl 2: unique
         (3, "z"), (7, "z")],         # crawl 3: first + within-dup
        "doc_id long, text string")
    got = {r["crawl"]: r for r in dd.dup_rate_trend(docs, n_crawls=4).collect()}
    assert len(got) == 4
    for c in range(4):
        r = got[c]
        assert r["n_new"] + r["n_dup_within"] + r["n_dup_prior"] == r["n_docs"]
    assert (got[0]["n_docs"], got[0]["n_new"], got[0]["n_dup_within"],
            got[0]["n_dup_prior"]) == (2, 1, 1, 0)
    assert got[0]["dup_within_bp"] == 5000 and got[0]["dup_prior_bp"] == 0
    assert (got[1]["n_docs"], got[1]["n_dup_prior"]) == (3, 3)
    assert got[1]["dup_prior_bp"] == 10000
    assert (got[2]["n_docs"], got[2]["n_new"]) == (1, 1)
    assert (got[3]["n_docs"], got[3]["n_new"], got[3]["n_dup_within"]) == \
        (2, 1, 1)


def test_packing_lenscan_sweep(spark):
    """Lenscan pins: every candidate L satisfies n_seqs*L = total_toks +
    tail_waste_toks, split/waste counts match a brute-force Python twin
    computed from _pack_base's own offsets (the L-independence fact), and
    the L == SEQ_LEN row agrees with packing_stats' shard rollup."""
    from pdf_parser_spark.operators import curation as C

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range((i * 7) % 23 + 1)))
         for i in range(40)] + [(40, "   ")],
        "doc_id long, text string")
    base = C._pack_base(docs, C.SHUFFLE_SEED, C.SHUFFLE_SHARDS).collect()
    got = {r["seq_len"]: r for r in C.packing_lenscan(docs).collect()}
    assert set(got) == set(C.PACK_LEN_GRID)
    shard_tot = {}
    for r in base:
        shard_tot[r["shard"]] = shard_tot.get(r["shard"], 0) + r["n_tok"]
    for L, row in got.items():
        assert row["n_seqs"] * L == row["total_toks"] + row["tail_waste_toks"]
        exp_seqs = sum(-(-t // L) for t in shard_tot.values())
        exp_waste = exp_seqs * L - sum(shard_tot.values())
        exp_split = sum(1 for r in base
                        if r["off"] // L != (r["off"] + r["n_tok"] - 1) // L)
        assert (row["n_seqs"], row["tail_waste_toks"], row["n_split_docs"],
                row["n_docs"]) == (exp_seqs, exp_waste, exp_split, 40)
        assert row["waste_bp"] == (10000 * exp_waste) // (exp_seqs * L)
        assert row["split_docs_bp"] == (10000 * exp_split) // 40
    stats = C.packing_stats(docs).collect()
    assert got[C.SEQ_LEN]["n_seqs"] == sum(r["n_seqs"] for r in stats)
    assert got[C.SEQ_LEN]["tail_waste_toks"] == \
        sum(r["tail_waste_toks"] for r in stats)
    assert got[C.SEQ_LEN]["n_split_docs"] == \
        sum(r["n_split_docs"] for r in stats)


def test_temperature_mix_alpha_sweep(spark):
    """Temperature pins: every (alpha, source) cell matches a math.sqrt
    python twin (floor at milli-units, integer shares on top), alpha=1.0
    reproduces raw shares exactly, and the small source's smoothed share
    rises monotonically as alpha falls (the flattening that is the whole
    point of temperature sampling)."""
    import math
    from pdf_parser_spark.operators import curation as C

    docs = spark.createDataFrame(
        # srcA: 4 docs x 25 tokens = 100; srcB: 4 x 100 = 400
        [(i, " ".join("w" for _ in range(25)), "srcA") for i in range(4)]
        + [(i + 4, " ".join("w" for _ in range(100)), "srcB")
           for i in range(4)],
        "doc_id long, text string, source string")
    got = {(r["alpha_bp"], r["source"]): r
           for r in C.temperature_mix(docs).collect()}
    cnt = {"srcA": 100, "srcB": 400}
    tot = 500

    def f(c, ab):
        x = float(c)
        return {2500: math.sqrt(math.sqrt(x)), 5000: math.sqrt(x),
                7500: math.sqrt(x) * math.sqrt(math.sqrt(x)),
                10000: x}[ab]

    for ab in C.TEMP_ALPHA_GRID_BP:
        s = {k: math.floor(1000 * f(v, ab)) for k, v in cnt.items()}
        stot = sum(s.values())
        for src in cnt:
            r = got[(ab, src)]
            raw = (10000 * cnt[src]) // tot
            temp = (10000 * s[src]) // stot
            assert (r["n_tokens"], r["raw_share_bp"], r["temp_share_bp"],
                    r["boost_bp"]) == \
                (cnt[src], raw, temp, (10000 * temp) // raw)
    # alpha = 1.0 is the identity smoothing
    assert got[(10000, "srcA")]["temp_share_bp"] == \
        got[(10000, "srcA")]["raw_share_bp"]
    # flattening: srcA (small) gains share as alpha falls
    shares = [got[(ab, "srcA")]["temp_share_bp"]
              for ab in sorted(C.TEMP_ALPHA_GRID_BP)]
    assert shares == sorted(shares, reverse=True)


def test_mime_sniff_magic_bytes(spark):
    """Sniff pins: detection reads ACTUAL bytes, not the doc_id formula —
    hand-built payloads (a BMP header, a RIFF/WAVE, a P5 PPM, a truncated
    RIFF missing its WAVE tag, and plain text) each sniff to the right
    type, and the mismatch flag fires exactly where declared != sniffed."""
    from pdf_parser_spark.operators import multimodal as mm

    rows = [
        (0, b"BM" + b"\x00" * 20, "image/bmp"),
        (1, b"RIFF\x24\x00\x00\x00WAVEfmt ", "audio/wav"),
        (2, b"P5\n4 4\n255\n" + b"\x00" * 16, "image/ppm"),
        # RIFF container that is NOT wav (no WAVE at offset 8)
        (3, b"RIFF\x24\x00\x00\x00AVI fmt ", "audio/wav"),
        (4, b"hello world", "image/bmp"),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, payload binary, declared string")
    got = {r["doc_id"]: (r["sniffed"], r["mismatch"])
           for r in mm.mime_sniff(media).collect()}
    assert got[0] == ("image/bmp", False)
    assert got[1] == ("audio/wav", False)
    assert got[2] == ("image/ppm", False)
    assert got[3] == ("application/octet-stream", True)
    assert got[4] == ("application/octet-stream", True)
    # the registered composition: lies land exactly on the MIME_LIE_MOD grid
    docs = spark.createDataFrame(
        [(i, "t") for i in range(21)], "doc_id long, text string")
    comp = mm.mime_sniff(mm.with_declared_mime(mm.synthetic_media(docs)))
    for r in comp.collect():
        assert r["mismatch"] == (r["doc_id"] % mm.MIME_LIE_MOD == 0)


def test_host_kcore_numbers(spark):
    """Coreness pins: a 4-clique is core 3, a triangle hanging off it by
    one bridge edge is core 2, a pendant is core 1, an isolated host is
    core 0, and the values equal a brute-force sequential peeler — the
    h-index iteration's fixed point is the true core number, not the
    degree (c has degree 4 but core 2: the hub-vs-farm distinction)."""
    from pdf_parser_spark.operators import linkgraph as lg

    urls = spark.createDataFrame(
        [(i, h) for i, h in enumerate("abcdefghi")],
        "doc_id long, host string")
    E = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
         ("f", "g"), ("f", "h"), ("f", "i"), ("g", "h"), ("g", "i"),
         ("h", "i"), ("c", "f")]
    nid = {h: i for i, h in enumerate("abcdefghi")}
    edges = spark.createDataFrame(
        [(nid[x], nid[y]) for x, y in E], "src long, dst long")
    got = {r["host"]: r["core"] for r in lg.host_kcore(edges, urls).collect()}

    # sequential peel twin
    adj = {}
    for x, y in E:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    core, deg = {}, {h: len(n) for h, n in adj.items()}
    alive = set(adj)
    k = 0
    while alive:
        peel = [h for h in alive if deg[h] <= k]
        if not peel:
            k += 1
            continue
        for h in peel:
            core[h] = k
            alive.discard(h)
            for nb in adj[h]:
                if nb in alive:
                    deg[nb] -= 1
    expected = {h: core.get(h, 0) for h in "abcdefghi"}
    assert got == expected
    assert got["f"] == 3 and got["c"] == 2 and got["d"] == 1 and got["e"] == 0


def test_image_dhash_local_vs_ahash_global(spark):
    """dHash pins: exact bit strings on a hand-built 8x8 gradient BMP,
    and the robustness claim that motivates the second hash — a bright
    top-row overlay shifts aHash's GLOBAL mean and flips 32 of its bits,
    while dHash's LOCAL comparisons flip only the 7 bits whose samples
    the edit touches."""
    from pdf_parser_spark.operators import multimodal as mm

    def bmp(rows):  # rows: 8 lists of 8 grays, stored order, no padding
        hdr = bytearray(54)
        hdr[0:2] = b"BM"
        hdr[10:14] = (54).to_bytes(4, "little")
        hdr[14:18] = (40).to_bytes(4, "little")
        hdr[18:22] = (8).to_bytes(4, "little")
        hdr[22:26] = (8).to_bytes(4, "little")
        hdr[26:28] = (1).to_bytes(2, "little")
        hdr[28:30] = (24).to_bytes(2, "little")
        body = bytearray()
        for r in rows:
            for g in r:
                body += bytes([g, g, g])
        return bytes(hdr + body)

    base_rows = [[10 + c for c in range(8)] for _ in range(8)]
    edit_rows = [[255] * 8] + [[10 + c for c in range(8)] for _ in range(7)]
    media = spark.createDataFrame(
        [(0, bmp(base_rows)), (1, bmp(edit_rows))],
        "doc_id long, payload binary")
    dh = {r["doc_id"]: r["dhash"] for r in mm.image_dhash(media).collect()}
    ah = {r["doc_id"]: r["ahash"] for r in mm.image_ahash(media).collect()}
    # 8x9 sampling on width 8 maps cols 0,0,1..7: first comparison ties
    assert dh[0] == "01111111" * 8
    assert dh[1] == "00000000" + "01111111" * 7
    # mean 13 -> cols 14..17 set; overlay mean 43 -> only the 255-row set
    assert ah[0] == "00001111" * 8
    assert ah[1] == "11111111" + "00000000" * 7
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))
    assert ham(dh[0], dh[1]) == 7
    assert ham(ah[0], ah[1]) == 32


def test_crawl_admission_stage_order(spark):
    """Admission pins: first_block names the FIRST firing stage (a
    blocklisted url that is also trap-shaped and robots-disallowed reads
    'blocklist'), trap beats robots, and the per-domain quota counts
    SURVIVORS only — a trapped url on the same domain does not consume a
    quota slot."""
    from pdf_parser_spark.operators import weburl as wu

    rows = [
        # blocked + trap-shaped + robots path: order says blocklist
        (0, "https://bad.co.uk/docs/x?page=99999"),
        # trap (runaway pagination) on the quota domain: must not consume
        (1, "https://ok.io/list?page=99999"),
        # robots: len('abc.io') % 3 == 0 disallows /docs/
        (2, "https://abc.io/docs/p"),
    ] + [(3 + i, f"https://ok.io/p{i}") for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: (r["admitted"], r["first_block"])
           for r in wu.crawl_admission(df, ["bad.co.uk"]).collect()}
    assert got[0] == (False, "blocklist")
    assert got[1] == (False, "trap")
    assert got[2] == (False, "robots")
    # 7 clean ok.io docs against quota 5: first five admitted by doc_id
    for i in range(5):
        assert got[3 + i] == (True, "")
    assert got[8] == (False, "quota") and got[9] == (False, "quota")


def test_jaccard_threshold_sweep(spark):
    """Sweep pins: counts per threshold equal a python twin replaying the
    op's own banded candidate set with exact shingle Jaccard (verify
    once, threshold many), graded near-copies separate the thresholds,
    and a threshold above every pair zero-fills."""
    from pdf_parser_spark.operators import dedup as dd

    base = " ".join(f"w{j}" for j in range(30))
    docs = spark.createDataFrame(
        [(0, base),
         (1, base),                                    # exact copy
         (2, base + " x1 x2 x3"),                      # high-jac edit
         (3, " ".join(f"w{j}" for j in range(15))
             + " " + " ".join(f"z{j}" for j in range(15))),  # mid overlap
         (4, " ".join(f"q{j}" for j in range(30)))],   # disjoint
        "doc_id long, text string")
    grid = (2000, 6000, 9999)
    got = {r["threshold_bp"]: (r["n_pairs"], r["n_docs"])
           for r in dd.jaccard_threshold_sweep(docs, grid=grid).collect()}

    cands = {(r["doc_a"], r["doc_b"])
             for r in dd._band_candidates(docs, 3).collect()}
    texts = {0: base, 1: base, 2: base + " x1 x2 x3",
             3: " ".join(f"w{j}" for j in range(15)) + " "
                + " ".join(f"z{j}" for j in range(15)),
             4: " ".join(f"q{j}" for j in range(30))}

    def sh(t):
        w = t.split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    jac = {}
    for a, b in cands:
        u = sh(texts[a]) | sh(texts[b])
        if u:
            jac[(a, b)] = (10000 * len(sh(texts[a]) & sh(texts[b]))) // len(u)
    for th in grid:
        qual = {p for p, j in jac.items() if j >= th}
        exp_docs = {d for p in qual for d in p}
        assert got[th] == (len(qual), len(exp_docs))
    # the exact pair survives everywhere; 9999 drops the x1-x3 edits
    # ((0,2)/(1,2) verify at 9032 bp: 28 shared of 31 union shingles)
    assert (0, 1) in jac and jac[(0, 1)] == 10000
    assert jac[(0, 2)] == 9032 and jac[(1, 2)] == 9032
    assert got[2000] == (3, 3) and got[6000] == (3, 3)
    assert got[9999] == (1, 2)


def test_crawl_queue_audit_recurrence_rollup(spark):
    """Queue audit pins: per-host rollup equals a python max-plus
    recurrence twin walked over the op's own (arrival, delay) columns; a
    delay-0 host reads all-zero waits (emit = arrival); drain_rank 1 is
    the host with the latest drain (host asc tie-break)."""
    from pdf_parser_spark.operators import weburl as wu
    from pdf_parser_spark.streaming.ratelimit import with_arrivals

    docs = _docs(spark, [(i, "t", "en", "s", 1) for i in range(120)])
    arr = {r["doc_id"]: (r["host"], r["arrival_ms"], r["delay_ms"])
           for r in with_arrivals(docs).collect()}
    by_host = {}
    for d, (h, a, dl) in arr.items():
        by_host.setdefault(h, []).append((a, d, dl))

    exp = {}
    for h, mem in by_host.items():
        mem.sort()  # (arrival, doc_id) order
        delay = mem[0][2]
        last, waits, emits = None, [], []
        for a, d, _ in mem:
            e = a if last is None else max(a, last + delay)
            last = e
            waits.append(e - a)
            emits.append(e)
        exp[h] = (len(mem), delay, min(a for a, _, _ in mem), max(emits),
                  sum(waits), max(waits))

    out = {r["host"]: r for r in wu.crawl_queue_audit(docs).collect()}
    assert set(out) == set(exp)
    for h, (n, dl, fa, dr, tw, mw) in exp.items():
        r = out[h]
        assert (r["n_urls"], r["delay_ms"], r["first_arrival_ms"],
                r["drain_ms"], r["total_wait_ms"], r["max_wait_ms"]) == \
            (n, dl, fa, dr, tw, mw), h

    # delay formula (len(host)%5)*100 guarantees zero-delay hosts exist
    zero = [h for h, (_, dl, *_t) in exp.items() if dl == 0]
    assert zero
    for h in zero:
        assert out[h]["total_wait_ms"] == 0 and out[h]["max_wait_ms"] == 0

    ranked = sorted(exp.items(), key=lambda kv: (-kv[1][3], kv[0]))
    for i, (h, _) in enumerate(ranked, 1):
        assert out[h]["drain_rank"] == i


def test_image_dims_header_walk(spark):
    """Header-only dims: PNG/GIF fixed offsets, JPEG via the bounded
    aggregate() marker walk — incl. a deep segment chain, walk
    exhaustion at the budget, and unknown magic failing soft."""
    from pdf_parser_spark.operators import multimodal as mm

    deep = (b"\xff\xd8"
            + b"".join(b"\xff\xfe\x00\x05xxx" for _ in range(10))
            + mm.make_jpeg(321, 77)[2:])  # 10 COMs then APP0/COM/SOF0
    rows = [
        (1, mm.make_png(640, 480)),
        (2, mm.make_jpeg(800, 600, com_pad=7)),
        (3, mm.make_gif(300, 200)),
        (4, b"not an image at all"),
        (5, deep),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in mm.image_dims(df).collect()}
    assert (out[1]["format"], out[1]["width"], out[1]["height"],
            out[1]["ok"]) == ("png", 640, 480, True)
    assert (out[2]["format"], out[2]["width"], out[2]["height"],
            out[2]["ok"]) == ("jpeg", 800, 600, True)
    assert (out[3]["format"], out[3]["width"], out[3]["height"],
            out[3]["ok"]) == ("gif", 300, 200, True)
    assert (out[4]["format"], out[4]["width"], out[4]["ok"]) == (
        "unknown", None, False)
    # 10 COMs + APP0 + COM + SOF = 13 segments < 16 budget -> found
    assert (out[5]["format"], out[5]["width"], out[5]["height"],
            out[5]["ok"]) == ("jpeg", 321, 77, True)
    # budget exhaustion: same deep payload, max_segments=4 -> fail soft
    tight = {r["doc_id"]: r
             for r in mm.image_dims(df, max_segments=4).collect()}
    assert tight[5]["ok"] is False and tight[5]["width"] is None
    assert tight[2]["ok"] is True  # 3-segment jpeg still inside budget


def test_image_phash_contrast_invariant_and_grouping(spark):
    """pHash pins: exact invariance under contrast scaling (every
    coefficient and the median scale by the same positive factor, so
    the > comparisons are unchanged — exact in integers), golden
    stability on a deterministic BMP, and n_same grouping."""
    import struct

    from pdf_parser_spark.operators import multimodal as mm

    def bmp_from_bytes(width, height, px):
        row = ((width * 3 + 3) // 4) * 4
        header = b"BM" + struct.pack("<IHHI", 54 + row * height, 0, 0, 54)
        info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                           row * height, 2835, 2835, 0, 0)
        return header + info + bytes(px)

    w = h = 32
    row = ((w * 3 + 3) // 4) * 4
    # equal RGB per pixel so gray == the channel value EXACTLY ((r+g+b)//3
    # floors otherwise, breaking the doubling identity); <=127 so 2x fits
    base = [((o // 3) * 37 + 11) % 128 for o in range(row * h)]
    a = bmp_from_bytes(w, h, base)
    b = bmp_from_bytes(w, h, [v * 2 for v in base])
    pa, pb = mm._phash_of(a), mm._phash_of(b)
    assert pa is not None and pa == pb          # exact contrast invariance
    assert len(pa) == 64 and set(pa) <= {"0", "1"}
    assert pa == mm._phash_of(a)                # deterministic
    # a strong low-frequency edit (half-image brightness block) moves it
    grad = [v + 60 if i // row < h // 2 else v for i, v in enumerate(base)]
    assert mm._phash_of(bmp_from_bytes(w, h, grad)) != pa
    # grouping: two identical payloads share n_same=2
    df = spark.createDataFrame(
        [(1, a), (2, a), (3, b)], "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in mm.image_phash(df).collect()}
    assert out[1]["phash"] == out[2]["phash"] == out[3]["phash"]
    assert out[1]["n_same"] == 3  # b's hash equals a's by invariance


def test_outlinks_rel_token_semantics(spark):
    """rel parsing pins: token-list matching ('external nofollow' hints,
    'nofollowed' does not), attribute order inside the tag is free, and
    absent rel follows."""
    from pdf_parser_spark.operators import linkgraph as lg

    html = (
        '<a href="https://x.com/doc/1" rel="external nofollow">a</a>'
        '<a rel="ugc" href="https://x.com/doc/2">b</a>'
        '<a href="https://x.com/doc/3" rel="nofollowed">c</a>'
        '<a href="https://x.com/doc/4">d</a>'
        '<a href="https://x.com/doc/5" rel="sponsored">e</a>'
    )
    df = spark.createDataFrame([(9, html)], "doc_id long, html string")
    out = {r["dst"]: (r["rel"], r["followed"])
           for r in lg.extract_outlinks_rel(df).collect()}
    assert out[1] == ("external nofollow", False)  # token in a list
    assert out[2] == ("ugc", False)                # rel before href
    assert out[3] == ("nofollowed", True)          # substring is NOT a token
    assert out[4] == ("", True)                    # absent rel follows
    assert out[5] == ("sponsored", False)


def test_pagerank_followed_ignores_hinted_links(spark):
    """A page farming nofollow inlinks gains nothing on the followed
    subgraph: doc 2's only inlinks are hinted, so it sits at the BASE
    teleport floor, while plain pagerank on all edges rewards it."""
    from pdf_parser_spark.operators import linkgraph as lg

    docs = _docs(spark, [(i, "t", "en", "s", 1) for i in range(4)])
    all_edges = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 2), (1, 2), (3, 2)], "src long, dst long")
    followed = spark.createDataFrame(
        [(0, 1), (1, 0)], "src long, dst long")  # every ->2 link hinted
    pr_all = {r["doc_id"]: r["rank"]
              for r in lg.pagerank(docs, all_edges, iterations=3).collect()}
    pr_f = {r["doc_id"]: r["rank"]
            for r in lg.pagerank(docs, followed, iterations=3).collect()}
    assert pr_all[2] > lg.BASE          # farmed links pay off on all edges
    assert pr_f[2] == lg.BASE           # and nothing on the followed graph
    assert pr_f[0] > lg.BASE and pr_f[1] > lg.BASE


def test_kn_continuation_prices_context_locked_tokens(spark):
    """The KN signature: 'francisco' is FREQUENT in the reference but only
    ever follows 'san' (one continuation context), 'the' follows many —
    after an unseen context, KN prices 'francisco' strictly above 'the'
    (raw-count backoff would underprice it), and after 'san' the seen
    bigram prices 'francisco' cheaply."""
    from pdf_parser_spark.operators import textstats as ts

    ref = ("san francisco " * 8).strip()
    varied = "aa the bb the cc the dd the ee the ff the"
    docs = _docs(spark, [
        (0, ref, "en", "s", 1), (5, varied, "en", "s", 1),   # reference
        (11, "qqq francisco", "en", "s", 1),                 # unseen ctx
        (12, "qqq the", "en", "s", 1),
        (13, "san francisco", "en", "s", 1),                 # seen bigram
    ])
    out = {r["doc_id"]: r for r in ts.lm_surprisal_kn(docs).collect()}
    # same first token 'qqq' -> bits_sum difference isolates the pair
    assert out[11]["bits_sum"] > out[12]["bits_sum"]
    assert out[11]["n_kn_hits"] == 0 and out[13]["n_kn_hits"] == 1
    # the seen 'san francisco' bigram is the cheapest of the three
    assert out[13]["bits_sum"] < out[12]["bits_sum"]


def test_readability_formula_and_bands(spark):
    """Exact milli-unit pins on engineered text: 'See Spot run. See Spot
    play.' = 6 words, 2 sentences, 6 vowel groups -> ease 121.05 clamps
    into very_easy; a polysyllabic run lands very_difficult; a
    punctuation-free headline clamps sentences to 1."""
    from pdf_parser_spark.operators import textstats as ts

    docs = _docs(spark, [
        (1, "See Spot run. See Spot play.", "en", "s", 1),
        (2, "incomprehensibility organizational prioritization "
            "internationalization", "en", "s", 1),
        (3, "no punctuation here", "en", "s", 1),
    ])
    out = {r["doc_id"]: r for r in ts.readability(docs).collect()}
    r1 = out[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (6, 2, 6)
    assert r1["reading_ease_milli"] == 206835 - (1015 * 6) // 2 - (84600 * 6) // 6
    assert r1["fk_grade_milli"] == (390 * 6) // 2 + (11800 * 6) // 6 - 15590
    assert r1["band"] == "very_easy"
    assert out[2]["band"] == "very_difficult"  # ~5 vowel groups per word
    assert out[3]["n_sentences"] == 1          # clamp, not zero-div


def test_frontier_v2_demotes_suspects_with_dense_slots(spark):
    """frontier_schedule_v2: every spam-mass suspect (computed over the
    SAME followed edges) is absent, every emitted page is non-suspect,
    and per-host slots stay dense after the demotion (no politeness
    holes)."""
    from pdf_parser_spark.operators import linkgraph as lg

    docs = _docs(
        spark,
        [(i, f"word{i} text body sample", "en", f"s{i % 4}", 1)
         for i in range(34)],
    )
    edges = lg.endorsed_edges(docs)
    suspects = {r["doc_id"]
                for r in lg.spam_mass(docs, edges, iterations=2).collect()
                if r["suspect"]}
    rows = lg.frontier_schedule_v2(docs, per_domain=3, iterations=2).collect()
    assert rows and suspects  # both sides non-trivial on this corpus
    emitted = {r["doc_id"] for r in rows}
    assert emitted.isdisjoint(suspects)
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r["fetch_slot"])
    for slots in by_host.values():
        assert sorted(slots) == list(range(1, len(slots) + 1))


def test_audio_spectral_peak_finds_sinusoid_bin(spark):
    """A pure sinusoid at bin k dominates window k's spectrum: synthesize
    int16 PCM cos(2*pi*k*n/64) for k=5 then k=11 (one window each), wrap
    as RIFF/WAVE, and pin the detected peak bins; the partial tail
    window is skipped."""
    import math
    import struct

    from pdf_parser_spark.operators import multimodal as mm

    def wav_of(samples):
        data = b"".join(struct.pack("<h", s) for s in samples)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    win = mm.SPEC_WIN
    tone = lambda k: [round(1000 * math.cos(2 * math.pi * k * n / win))
                      for n in range(win)]
    payload = wav_of(tone(5) + tone(11) + [100] * 10)  # partial tail drops
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    rows = {r["win_idx"]: r for r in mm.audio_spectral_peaks(df).collect()}
    assert sorted(rows) == [0, 1]          # the 10-sample tail is skipped
    assert rows[0]["peak_bin"] == 5
    assert rows[1]["peak_bin"] == 11
    assert rows[0]["peak_mag2"] > 0


def test_rel_canonical_chains_cycles_and_self(spark):
    """Canonical resolution pins: chained declarations fold to the
    terminal, self/absent declarations are their own canonical, and a
    declaration CYCLE (a<->b) leaves both pages self-canonical rather
    than hanging (the resolver's unresolved verdict maps to
    keep-your-own-url, the spec's advisory fallback)."""
    from pdf_parser_spark.operators import weburl as wu

    link = lambda href: (f'<html><head><link rel="canonical" '
                         f'href="{href}"></head></html>')
    rows = [
        (1, "u://a", link("u://b")),       # chain a -> b -> c
        (2, "u://b", link("u://c")),
        (3, "u://c", link("u://c")),       # self-canonical terminal
        (4, "u://d", "<html><head></head></html>"),  # no declaration
        (5, "u://x", link("u://y")),       # cycle x <-> y
        (6, "u://y", link("u://x")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    out = {r["doc_id"]: r for r in wu.rel_canonical_clusters(df).collect()}
    assert out[1]["canonical_url"] == out[2]["canonical_url"] == "u://c"
    assert out[3]["canonical_url"] == "u://c" and out[3]["is_canonical"]
    assert out[3]["n_in_cluster"] == 3
    assert out[4]["canonical_url"] == "u://d" and out[4]["is_canonical"]
    for i in (5, 6):  # cycle: advisory fallback, self-canonical
        assert out[i]["is_canonical"] and out[i]["n_in_cluster"] == 1


def test_lexical_diversity_mattr(spark):
    """MATTR pins: a 50-token doc of one repeated token scores 10000/25
    = 400 bp per window; an all-distinct doc scores 10000; a short doc
    falls back to plain TTR; and MATTR is length-stable where TTR is
    not (the Covington-McFall point)."""
    from pdf_parser_spark.operators import textstats as ts

    rep = " ".join(["tok"] * 50)
    uniq = " ".join(f"w{i}" for i in range(50))
    cyc = " ".join(f"c{i % 10}" for i in range(30))     # 10-token cycle
    cyc_long = " ".join(f"c{i % 10}" for i in range(300))
    docs = _docs(spark, [
        (1, rep, "en", "s", 1), (2, uniq, "en", "s", 1),
        (3, "a b a", "en", "s", 1),                     # short fallback
        (4, cyc, "en", "s", 1), (5, cyc_long, "en", "s", 1),
    ])
    out = {r["doc_id"]: r for r in ts.lexical_diversity(docs).collect()}
    assert out[1]["mattr_bp"] == 10000 // 25            # 1 type / window
    assert out[2]["mattr_bp"] == 10000 and out[2]["ttr_bp"] == 10000
    assert out[3]["mattr_bp"] == out[3]["ttr_bp"] == (10000 * 2) // 3
    # every 25-window of a 10-cycle has exactly 10 types -> 4000 bp at
    # BOTH lengths, while plain TTR collapses 10x on the long doc
    assert out[4]["mattr_bp"] == out[5]["mattr_bp"] == 4000
    assert out[5]["ttr_bp"] < out[4]["ttr_bp"]

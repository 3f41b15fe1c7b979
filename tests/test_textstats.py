from ocr_pipeline_ray.functions.textstats import (
    detect_language,
    fingerprint_md5,
    quality_stats,
    tokenize,
    winnow_fingerprints,
)


def test_tokenize_ascii_words():
    assert tokenize("foo bar_1 baz!  qux") == ["foo", "bar_1", "baz", "qux"]


def test_fingerprint_whitespace_case_insensitive():
    assert fingerprint_md5("Hello   World\n") == fingerprint_md5("hello world")
    assert fingerprint_md5("hello world") != fingerprint_md5("hello worlds")


def test_detect_language():
    assert detect_language("the cat and the dog sat in a house for a while") == "en"
    assert detect_language("der hund und die katze ist nicht zu haus mit von") == "de"
    assert detect_language("el perro y la casa es un lugar que por con") == "es"
    assert detect_language("le chien est dans la maison pour un moment sur et") == "fr"
    assert detect_language("这是一个中文文档") == "zh"
    assert detect_language("") == "unknown"


def test_quality_stats():
    good = quality_stats(
        "This is a well formed paragraph of text with the usual words and punctuation. "
        "It has enough tokens to look like real content."
    )
    bad = quality_stats("x")
    assert good["quality_score"] > bad["quality_score"]
    assert good["n_tokens"] > 10
    assert bad["n_chars"] == 1


def test_winnowing_overlap_property():
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    other = "one two three four five six seven eight nine ten " * 5
    fp_base = set(winnow_fingerprints(base))
    fp_same = set(winnow_fingerprints(base))
    fp_other = set(winnow_fingerprints(other))
    assert fp_base == fp_same
    assert len(fp_base & fp_other) == 0
    assert winnow_fingerprints("too short") == []


def test_curate_corpus_composition(tmp_path):
    """Quality junk dropped, duplicates collapse to min doc_id,
    survivors keep their ids."""
    import pandas as pd

    good = ("the quick brown fox jumps over the lazy dog and runs to the river "
            "bank again today with plenty of good long english words to read")
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                good,
                good,                      # exact dup of 0 -> dropped
                "@@## !!",                # junk -> quality-filtered
                good + " unique tail",    # distinct survivor
                "x",                       # too short -> filtered
            ],
        }
    )
    d = tmp_path / "cur"
    d.mkdir()
    docs.to_parquet(d / "documents.parquet")
    from ocr_pipeline_ray.pipelines.text import curate_corpus

    out = curate_corpus(str(d))
    assert out["doc_id"].tolist() == [0, 3]


def test_repetition_stats_planted(tmp_path):
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "alpha beta gamma delta epsilon zeta eta theta iota kappa",  # clean
                "same line here\nsame line here\nsame line here\nunique tail words",  # dup lines
                "spam spam spam spam spam spam spam spam",  # one bigram dominates
            ],
        }
    )
    d = tmp_path / "rep"
    d.mkdir()
    docs.to_parquet(d / "documents.parquet")
    from ocr_pipeline_ray.pipelines.text import repetition_stats

    out = repetition_stats(str(d)).set_index("doc_id")
    assert out.loc[0, "dup_line_frac"] == 0.0 and out.loc[0, "top_bigram_frac"] < 0.2
    assert out.loc[1, "dup_line_frac"] > 0.35  # 6 of 15 tokens in repeated lines
    assert out.loc[2, "top_bigram_frac"] == 1.0


def test_bpe_learn_merges_vs_reference():
    """Distributed BPE training matches an INDEPENDENT single-process
    implementation (Counter-based, no shared code path beyond the
    tokenizer regex and the published merge rule)."""
    from collections import Counter

    import pyarrow.parquet as pq

    from ocr_pipeline_ray.functions.textstats import TOKEN_RE
    from ocr_pipeline_ray.pipelines.text import bpe_learn_merges

    sf = "/root/testdata/sf0.001"
    got = bpe_learn_merges(sf, n_merges=6)

    texts = pq.read_table(f"{sf}/documents.parquet", columns=["text"])["text"].to_pylist()
    vocab = Counter(w.lower() for s in texts for w in TOKEN_RE.findall(s))
    words = {w: list(w) for w in vocab}
    want = []
    for rank in range(6):
        pairs = Counter()
        for w, sym in words.items():
            n = vocab[w]
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # deterministic tie-break: count desc, then lexicographic asc
        top_n = max(pairs.values())
        cands = sorted(k for k, v in pairs.items() if v == top_n)
        best = cands[0]
        want.append((rank, best[0], best[1], top_n))
        l, r = best
        for w, sym in words.items():
            i, out = 0, []
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[w] = out
    assert [tuple(row) for row in got.itertuples(index=False)] == want


def test_duplicate_ngram_spans_hash_path_equals_string_path():
    """The 100 TB hash-gram shuffle knob must not change the profile
    on real corpora (u64 collisions are vanishingly unlikely here)."""
    from ocr_pipeline_ray.pipelines.text import duplicate_ngram_spans

    sf = "/root/testdata/sf0.001"
    a = duplicate_ngram_spans(sf, hash_grams=False)
    b = duplicate_ngram_spans(sf, hash_grams=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_compression_ratio_known_answers():
    """Repetitive text compresses harder than high-entropy text, every
    doc emits one row, ratios are in (0, ~1.1]."""
    from ocr_pipeline_ray.pipelines.text import compression_ratio

    out = compression_ratio("/root/testdata/sf0.001")
    assert len(out) == 500
    # header overhead can push tiny docs above 1.0; cap generously
    assert (out["zlib_ratio"] > 0).all() and (out["zlib_ratio"] <= 4.0).all()
    import zlib

    rep = ("spam " * 400).encode()
    uniq = bytes(range(256)) * 8
    assert len(zlib.compress(rep)) / len(rep) < len(zlib.compress(uniq)) / len(uniq)


def test_bpe_apply_tokenize_matches_local_reference():
    import pyarrow.parquet as pq

    from ocr_pipeline_ray.pipelines.text import (
        TOKEN_RE,
        _apply_merges,
        bpe_apply_tokenize,
        bpe_learn_merges,
    )

    sf = "/root/testdata/sf0.001"
    got = bpe_apply_tokenize(sf, n_merges=8)
    learned = bpe_learn_merges(sf, n_merges=8)
    merges = list(zip(learned["left"], learned["right"]))
    df = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == df["doc_id"].tolist()
    for i in range(0, len(df), 97):  # spot rows across the corpus
        words = [w.lower() for w in TOKEN_RE.findall(df["text"][i])]
        want = sum(len(_apply_merges(list(w), merges)) for w in words)
        assert got["n_subwords"][i] == want
        assert got["n_words"][i] == len(words)
    # merges strictly compress: subwords < raw chars, >= word count
    assert (got["n_subwords"] >= got["n_words"]).all()


def test_quality_classifier_matches_sequential_reference():
    """Pin the distributed full-batch-GD logistic trainer to the
    single-process numpy reference: identical weights (the gradient is
    a sum over docs, so batch partials must add exactly) and a
    better-than-chance train accuracy."""
    from ocr_pipeline_ray.pipelines.text import (
        quality_classifier,
        quality_classifier_reference,
    )

    sf = "/root/testdata/sf0.001"
    got = quality_classifier(sf, iters=10)
    ref = quality_classifier_reference(sf, iters=10)
    assert got["name"].tolist() == ref["name"].tolist()
    assert got["value"].tolist() == ref["value"].tolist()
    acc = float(got.loc[got["name"] == "train_accuracy", "value"].iloc[0])
    assert acc >= 0.6

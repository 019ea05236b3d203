"""Corpus-release operators (operators/text.py): PII redaction,
benchmark decontamination, tf-idf top terms. The oracle pairs
(text_redact_pii / decontam_ngram_overlap / text_tfidf_top_terms) cover
bit-parity on the synthetic corpus; these cover the semantic contracts
on adversarial inputs the corpus lacks (real PII spans, clean docs,
tf-idf tie-breaks)."""
from __future__ import annotations

from pyspark.sql import functions as F

from yougile_etl_pipeline_spark.operators.text import (
    ngram_contamination,
    redact_pii,
    tfidf_top_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_redact_pii_replaces_and_counts(spark):
    out = {r.doc_id: r for r in redact_pii(_docs(spark, [
        (1, "mail a@b.com and c.d+x@e.org now"),
        (2, "call 415-555-0199 or 415.555.0100"),
        (3, "no pii here at all"),
    ])).collect()}
    assert out[1].n_email == 2 and out[1].n_phone == 0
    assert out[1].text_redacted == "mail <EMAIL> and <EMAIL> now"
    assert out[2].n_phone == 2 and out[2].n_email == 0
    assert out[2].text_redacted == "call <PHONE> or <PHONE>"
    assert out[3].text_redacted == "no pii here at all"
    assert out[3].n_email == 0 and out[3].n_phone == 0


def test_redact_pii_mixed_types_counted_independently(spark):
    out = redact_pii(_docs(spark, [(1, "x 123-456-7890 y a@b.io z")]),
                     ).collect()[0]
    assert out.n_email == 1 and out.n_phone == 1
    assert out.text_redacted == "x <PHONE> y <EMAIL> z"


def test_redact_pii_ignores_digit_runs(spark):
    # \b-anchored phone pattern: digits inside longer runs (serial /
    # order numbers) are neither counted nor partially redacted
    out = redact_pii(_docs(spark, [(1, "order 9123-456-78901 shipped")]),
                     ).collect()[0]
    assert out.n_phone == 0
    assert out.text_redacted == "order 9123-456-78901 shipped"


def test_contamination_flags_only_overlapping_docs(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
    train = _docs(spark, [
        (1, "alpha beta gamma delta epsilon zeta"),   # contains bench 4-gram
        (2, "zeta eta theta iota kappa lambdaa"),     # clean
        (3, "x alpha beta gamma delta y"),            # one shared 4-gram
    ])
    got = {r.doc_id: r.n_shared_grams
           for r in ngram_contamination(train, bench, n=4).collect()}
    # doc 1 shares both bench 4-grams, doc 3 shares one, doc 2 absent
    assert got == {1: 2, 3: 1}


def test_contamination_empty_when_disjoint(spark):
    bench = _docs(spark, [(9, "p q r s t")])
    train = _docs(spark, [(1, "u v w x y")])
    assert ngram_contamination(train, bench, n=4).count() == 0


def test_tfidf_ranks_rare_terms_first(spark):
    df = _docs(spark, [
        (1, "common rare1 rare1 common"),
        (2, "common other other"),
        (3, "common unique3"),
    ])
    out = tfidf_top_terms(df, k=1).collect()
    top = {r.doc_id: (r.term, r.weight) for r in out}
    # 'common' has df=3 (weight tf*(3/3)); doc-specific terms have df=1
    assert top[1][0] == "rare1" and top[1][1] == 6.0
    assert top[2][0] == "other"          # tf=2, df=1 -> weight 6
    assert top[3][0] == "unique3"
    # ranks are dense within each doc and k bounds output size
    assert all(r.rank == 1 for r in out) and len(out) == 3


def test_tfidf_tie_breaks_by_term(spark):
    # two terms with identical tf and df -> identical weight; the winner
    # must be the lexicographically smaller term (deterministic)
    df = _docs(spark, [(1, "zz aa"), (2, "zz aa"), (3, "qq rr")])
    out = tfidf_top_terms(df, k=1).collect()
    assert {r.term for r in out} == {"aa", "qq"}


def test_tfidf_excludes_ubiquitous_terms(spark):
    # a term present in EVERY doc (df == N) must never rank — classical
    # idf sends it to ln(1) = 0, and the raw-ratio weight would
    # otherwise crown it at full tf (regression: review counterexample)
    df = _docs(spark, [
        (1, "common common common common rare"),
        (2, "common x"),
        (3, "common y"),
    ])
    out = tfidf_top_terms(df, k=1).collect()
    top = {r.doc_id: r.term for r in out}
    assert top[1] == "rare"
    assert "common" not in {r.term for r in out}

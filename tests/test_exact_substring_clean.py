"""ExactSubstr removal (Lee et al. 2022): the cleaner's per-doc accounting
must reconcile with the marker's span set, clean docs must survive whole,
and the cleaned text must be exactly the surviving tokens."""

import hashlib

from pyspark.sql import functions as F

from pyspark_cdc_engine.operators.curation import (
    exact_substring_clean,
    exact_substring_clean_text,
    exact_substring_dedup,
)
from tests.conftest import SF_DIR


def test_cleaner_reconciles_with_marker(spark):
    marker = {
        r["doc_id"]: r.asDict()
        for r in exact_substring_dedup(spark, SF_DIR).collect()
    }
    cleaner = {
        r["doc_id"]: r.asDict()
        for r in exact_substring_clean(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    assert len(cleaner) == n_docs, "every doc reports, clean ones included"
    assert marker, "fixture corpus must contain duplicated spans"
    for doc_id, m in marker.items():
        c = cleaner[doc_id]
        assert c["dup_tokens"] == m["dup_tokens"], (
            f"doc {doc_id}: cleaner removed {c['dup_tokens']} tokens but "
            f"marker flagged {m['dup_tokens']}"
        )
        assert c["clean_tokens"] == c["n_tokens"] - c["dup_tokens"]
    for doc_id, c in cleaner.items():
        if doc_id not in marker:
            assert c["dup_tokens"] == 0
            assert c["clean_tokens"] == c["n_tokens"]


def test_clean_text_matches_hash_and_token_count(spark):
    cleaned = {
        r["doc_id"]: r["clean_text"]
        for r in exact_substring_clean_text(spark, SF_DIR).collect()
    }
    report = {
        r["doc_id"]: r.asDict()
        for r in exact_substring_clean(spark, SF_DIR).collect()
    }
    assert set(cleaned) == set(report)
    for doc_id, text in cleaned.items():
        r = report[doc_id]
        assert hashlib.md5(text.encode()).hexdigest() == r["clean_md5"]
        n = len(text.split(" ")) if text else 0
        assert n == r["clean_tokens"], f"doc {doc_id} token count drift"


def test_clean_text_is_subsequence_of_original(spark):
    """Removal only deletes tokens — never reorders or rewrites them."""
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    cleaned = {
        r["doc_id"]: r["clean_text"]
        for r in exact_substring_clean_text(spark, SF_DIR).collect()
    }
    changed = 0
    for doc_id, text in cleaned.items():
        orig = docs[doc_id].split(" ")
        kept = text.split(" ") if text else []
        it = iter(orig)
        assert all(tok in it for tok in kept), (
            f"doc {doc_id}: cleaned text is not a subsequence"
        )
        if len(kept) != len(orig):
            changed += 1
    assert changed > 0, "fixture corpus must exercise actual removal"

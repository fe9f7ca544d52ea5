"""Planted-case semantics for the PII redaction / C4 filter kernels.

The sandbox corpus is digit- and punctuation-free, so the sf* parity run
(test_queries_vs_oracle) only proves pass-through; these cases carry the
actual redaction/filter behavior, each checked against the same DuckDB
oracle SQL the driver uses."""

import duckdb
import pandas as pd
import pytest

from p_id_text_extraction_ray.pipelines.webfilter import (
    C4_QUALITY_FLAGS_SQL, PII_REDACT_SQL, c4_flags_frame, redact_frame)

DOCS = pd.DataFrame({
    "doc_id": range(10),
    "text": [
        "contact bob.smith+spam@ex-ample.co.uk or alice@x.io thanks",
        "server at 192.168.0.1 and 10.0.0.255 responded",
        "call +1 (555) 123-4567 or 020 7946 0958 now",
        "mixed a@b.cc then 8.8.8.8 then 5551234567890 end",
        "plain words only no pii here at all " + "w " * 60,
        "Lorem ipsum dolor { code } javascript cookie policy",
        "short doc",
        "ends with exactly fifty-ish words of punctuation." + " ok" * 48,
        "",
        "email-ish a@b (no tld) and 1.2.3 (not an ip) stay put"]})


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", DOCS)
    return con.sql(sql).df()


@pytest.mark.parametrize("kernel,sql", [
    (redact_frame, PII_REDACT_SQL),
    (c4_flags_frame, C4_QUALITY_FLAGS_SQL)])
def test_kernel_matches_oracle_on_planted_docs(kernel, sql):
    mine = kernel(DOCS).sort_values("doc_id").reset_index(drop=True)
    oracle = _oracle(sql).sort_values("doc_id").reset_index(drop=True)
    assert sorted(mine.columns) == sorted(oracle.columns)
    pd.testing.assert_frame_equal(mine[sorted(mine.columns)],
                                  oracle[sorted(oracle.columns)],
                                  check_dtype=False)


def test_redaction_values():
    out = redact_frame(DOCS)
    assert out.loc[0, "clean_text"] == "contact <EMAIL> or <EMAIL> thanks"
    assert out.loc[0, "n_emails"] == 2
    assert out.loc[1, "clean_text"] == "server at <IP> and <IP> responded"
    assert out.loc[2, "n_phones"] == 2
    assert out.loc[3, ["n_emails", "n_ips", "n_phones"]].tolist() == [1, 1, 1]
    # invalid look-alikes survive untouched
    assert out.loc[9, "clean_text"] == DOCS.loc[9, "text"]
    assert out.loc[9, ["n_emails", "n_ips", "n_phones"]].sum() == 0
    # clean text is a pure pass-through
    assert out.loc[4, "clean_text"] == DOCS.loc[4, "text"]


def test_c4_flag_values():
    out = c4_flags_frame(DOCS).set_index("doc_id")
    assert not out.loc[5, "no_lorem_ipsum"]
    assert not out.loc[5, "no_curly_brace"]
    assert not out.loc[5, "no_policy_phrase"]
    assert not out.loc[5, "keep"]
    assert not out.loc[6, "keep"]          # under the word band
    assert out.loc[4, "keep"]              # long clean doc survives
    assert out.loc[7, "has_terminal_punct"] == False
    assert out.loc[7, "keep"]              # punct flag is not fatal
    assert bool(c4_flags_frame(pd.DataFrame({
        "doc_id": [0], "text": ["Done." + " ok" * 60]}))
        .loc[0, "has_terminal_punct"]) is False  # ends in 'ok'
    assert bool(c4_flags_frame(pd.DataFrame({
        "doc_id": [0], "text": [("ok " * 60).strip() + "."]}))
        .loc[0, "has_terminal_punct"])


def test_quality_model_kernel_matches_oracle_exactly():
    from p_id_text_extraction_ray.pipelines.webfilter import (
        QUALITY_MODEL_SCORE_SQL, QualityModelStage)
    docs = pd.concat([DOCS, pd.DataFrame(
        {"doc_id": [100], "text": ["Zyzzyva zealot zephyr zest"]})],
        ignore_index=True)
    mine = QualityModelStage()(docs).sort_values("doc_id") \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    oracle = con.sql(QUALITY_MODEL_SCORE_SQL).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(mine) == len(docs) - 1          # the empty doc drops
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False,
                                  check_exact=True)  # bit-exact at 6 dp


def test_quality_model_score_query_e2e(ray_session):
    from p_id_text_extraction_ray.pipelines.webfilter import quality_model_score
    df = quality_model_score("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    assert df["quality_score"].between(0, 1).all()
    # actor warm state does not leak across batches: same doc, same score
    again = quality_model_score("/root/testdata/sf0.001").to_pandas()
    pd.testing.assert_frame_equal(
        df.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True))


def test_curate_web_stage_composes_kernels():
    """The fused stage equals running the three kernels in sequence."""
    from p_id_text_extraction_ray.pipelines.webfilter import (
        CURATE_SCORE_MIN, CurateWebStage, QualityModelStage)
    docs = DOCS.assign(lang=["en", "de", "fr", "en", "de",
                             "fr", "en", "de", "fr", "en"])
    out = CurateWebStage()(docs)
    red = redact_frame(docs)
    merged = pd.DataFrame({"doc_id": docs["doc_id"], "lang": docs["lang"],
                           "text": red["clean_text"]})
    keep = c4_flags_frame(merged)["keep"].to_numpy()
    surv = merged.loc[keep]
    scores = QualityModelStage()(surv).set_index("doc_id")["quality_score"]
    want = surv[scores.reindex(surv["doc_id"]).to_numpy()
                >= CURATE_SCORE_MIN]
    assert list(out["doc_id"]) == list(want["doc_id"])
    assert (out["quality_score"] >= CURATE_SCORE_MIN).all()
    # PII placeholders survive into the curated text
    assert all("<EMAIL>" not in t or "@" not in t
               for t in out["clean_text"])

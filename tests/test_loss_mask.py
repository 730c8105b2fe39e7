"""Semantic invariant for the SFT loss-mask operator: the emitted offsets
must actually index the turns inside the newline-joined conversation string
(the property a tokenizer pipeline depends on), and the mask must select
exactly the assistant turns."""

import re

from ocr_mini_service_spark.operators import transcribe


def test_spans_reconstruct_turns(spark, sf_dir):
    df = transcribe.loss_mask_spans(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    docs["turn_text"] = (
        docs["text"]
        .str.strip()
        .map(lambda s: " ".join(re.sub(r"\s+", " ", s).split(" ")[: transcribe.MASK_WORDS]))
    )
    docs["conv_id"] = docs["doc_id"] // transcribe.TURNS_PER_CONV
    docs["turn_idx"] = docs["doc_id"] % transcribe.TURNS_PER_CONV
    for conv_id, grp in docs.groupby("conv_id"):
        grp = grp.sort_values("turn_idx")
        conv = "\n".join(grp["turn_text"])
        spans = df[df["conv_id"] == conv_id].sort_values("turn_idx")
        assert len(spans) == len(grp)
        for (_, s), (_, d) in zip(spans.iterrows(), grp.iterrows()):
            assert conv[s["start_off"] : s["end_off"]] == d["turn_text"]
    assert ((df["mask"] == 1) == (df["role"] == "assistant")).all()
    # spans within a conversation are disjoint and ordered
    g = df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")
    assert (g["start_off"].diff().dropna() > 0).all()


def test_conversation_stats_consistent_with_loss_mask_spans(spark, sf_dir):
    """The rollup and the span operator must tell the same story: per-conv
    char totals equal the span lengths, role counts match the masks, and the
    assistant share is the exact integer basis-point ratio."""
    spans = transcribe.loss_mask_spans(spark, sf_dir).toPandas()
    stats = transcribe.conversation_stats(spark, sf_dir).toPandas().set_index("conv_id")
    per = spans.groupby("conv_id").agg(
        n_turns=("turn_idx", "size"),
        n_assistant=("mask", "sum"),
        total_chars=("n_chars", "sum"),
    )
    assistant_chars = (
        spans.loc[spans["mask"] == 1].groupby("conv_id")["n_chars"].sum()
    )
    m = stats.join(per, rsuffix="_chk")
    assert (m["n_turns"] == m["n_turns_chk"]).all()
    assert (m["n_assistant"] == m["n_assistant_chk"]).all()
    assert (m["n_user"] == m["n_turns"] - m["n_assistant"]).all()
    assert (m["total_chars"] == m["total_chars_chk"]).all()
    assert (m["assistant_chars"] == assistant_chars.reindex(m.index).fillna(0)).all()
    assert (m["assistant_bp"] == m["assistant_chars"] * 10000 // m["total_chars"]).all()

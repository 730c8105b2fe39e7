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

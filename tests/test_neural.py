"""X2/X3 neural detection plumbing: chunking with offset remap, per-worker
model singleton, batched stub inference — must reproduce the deterministic
detector exactly (the stub emits the same spans, so any difference is a
chunking/remap/dedup bug)."""

import pandas as pd
import pytest

from named_entity_algorithm_project_spark.detector import extract_turn
from named_entity_algorithm_project_spark.operators.neural import (
    StubTokenClassifier,
    chunk_text,
    get_model,
    neural_span_fn,
)


def _mention_keys(result):
    return [
        (m.entity, m.entity_type, m.start, m.end, m.confidence)
        for m in result.mentions
    ]


def test_chunk_text_short_is_identity():
    assert chunk_text("a short text") == [(0, "a short text")]
    assert chunk_text("") == [(0, "")]


def test_chunk_text_long_offsets_and_overlap():
    words = [f"w{i}" for i in range(1400)]
    text = " ".join(words)
    chunks = chunk_text(text)
    assert len(chunks) >= 3
    covered_words = set()
    for start, chunk in chunks:
        # offset remap invariant: the chunk reads back from the original
        assert text[start : start + len(chunk)] == chunk
        covered_words.update(chunk.split())
    assert covered_words == set(words)  # nothing lost at boundaries
    # consecutive chunks overlap by the 50-word window
    first_words = chunks[0][1].split()
    second_words = chunks[1][1].split()
    assert first_words[-50:] == second_words[:50]


def test_worker_singleton_cached():
    assert get_model("stub") is get_model("stub")


def test_neural_stub_equals_deterministic_short_turns():
    texts = [
        "The PCE of P3HT reached 15.3 % after annealing (ANN) treatment",
        "Results for the organic photovoltaic platform were reproducible.",
        "The bandgap of MAPbI3 reached 1.6 V in this experiment.",
        "",
        None,
    ]
    span_fn = neural_span_fn(StubTokenClassifier())
    for text in texts:
        det = extract_turn(text)
        neu = extract_turn(text, span_fn=span_fn)
        assert _mention_keys(neu) == _mention_keys(det), text
        assert neu.abbreviations == det.abbreviations


def test_neural_long_turn_chunked_equals_unchunked():
    """>510-word turn forces multi-chunk inference; offset remap + overlap
    dedup must reproduce the single-pass deterministic result exactly."""
    sentence = (
        "The power conversion efficiency of P3HT reached 15.3 % while the "
        "bulk heterojunction showed notable mobility under bias conditions. "
    )
    text = sentence * 60  # ~1300 words, several chunks
    det = extract_turn(text)
    neu = extract_turn(text, span_fn=neural_span_fn(StubTokenClassifier()))
    assert len(det.mentions) > 0
    assert _mention_keys(neu) == _mention_keys(det)


def test_pipeline_neural_stub_end_to_end(spark, tmp_path):
    """Full pipeline with detector='neural:stub' must emit the identical
    triple set as the deterministic detector — same plumbing contract a
    real HF model would ride."""
    from named_entity_algorithm_project_spark.datagen import (
        TRANSCRIPTS_SCHEMA,
        generate_rows,
    )
    from named_entity_algorithm_project_spark.pipeline import (
        PipelineConfig,
        run_pipeline,
    )

    rows = generate_rows(n_convs=25, seed=37)
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)

    def triple_set(res):
        return {
            (r["subj"], r["pred"], r["obj"], r["conv_id"], r["turn_idx"])
            for r in res.triples.collect()
        }

    det = run_pipeline(
        spark, df, str(tmp_path / "det"),
        config=PipelineConfig(n_buckets=2), resume=False,
    )
    neu = run_pipeline(
        spark, df, str(tmp_path / "neu"),
        config=PipelineConfig(n_buckets=2, detector="neural:stub"),
        resume=False,
    )
    assert triple_set(neu) == triple_set(det)
    assert triple_set(neu)


def test_vocab_extension_bookkeeping():
    """X8 (app.py:3676-3686): case-insensitive vocab check, idempotent
    re-application, _ner_added_tokens tracking."""
    from named_entity_algorithm_project_spark.operators.neural import (
        ensure_vocab_extension,
    )

    model = StubTokenClassifier()
    model.add_tokens(["pce"])  # lowercase form already in base vocab
    added = ensure_vocab_extension(model, ["PCE", "OFET", "BHJ", ""])
    assert added == 2  # PCE skipped (pce in vocab), empty skipped
    assert model._ner_added_tokens == ["BHJ", "OFET"]
    # idempotent: nothing new on replay, tracking unchanged
    assert ensure_vocab_extension(model, ["OFET", "BHJ"]) == 0
    assert model._ner_added_tokens == ["BHJ", "OFET"]
    # incremental extension merges into the tracked set
    assert ensure_vocab_extension(model, ["DSSC"]) == 1
    assert model._ner_added_tokens == ["BHJ", "DSSC", "OFET"]


def test_harvest_abbreviation_tokens(spark):
    """Corpus-global abbreviation harvest: one Arrow UDF over the turns
    that contain a parenthesis, exploded + distinct."""
    from named_entity_algorithm_project_spark.operators.neural import (
        harvest_abbreviation_tokens,
    )

    df = spark.createDataFrame(
        [
            ("c1", 0, "We used power conversion efficiency (PCE) here."),
            ("c1", 1, "The organic field-effect transistor (OFET) worked."),
            ("c2", 0, "power conversion efficiency (PCE) again"),
            ("c2", 1, "no abbreviations in this turn"),
            ("c2", 2, None),
        ],
        "conv_id string, turn_idx int, text string",
    )
    assert harvest_abbreviation_tokens(df) == ["OFET", "PCE"]


def test_pipeline_extend_vocab_runs(spark, tmp_path):
    from named_entity_algorithm_project_spark.datagen import (
        TRANSCRIPTS_SCHEMA,
        generate_rows,
    )
    from named_entity_algorithm_project_spark.pipeline import (
        PipelineConfig,
        run_pipeline,
    )

    rows = generate_rows(n_convs=10, seed=41)
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    res = run_pipeline(
        spark,
        df,
        str(tmp_path / "x8"),
        config=PipelineConfig(
            n_buckets=2, detector="neural:stub", extend_vocab=True
        ),
        resume=False,
    )
    assert res.triples.count() > 0


def test_hf_model_unavailable_raises_clear_error():
    with pytest.raises(ImportError, match="neural:stub"):
        get_model("dslim/bert-base-NER")

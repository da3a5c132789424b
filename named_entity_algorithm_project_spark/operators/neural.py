"""X2/X3 — neural token-classification detection behind the shared
Arrow-UDF interface.

The reference's headline extractor is an HF token-classification pipeline:
load model once (app.py:1249-1416), 512-token chunking with 50-token
overlap (chunk_text, app.py:2854-2943), per-chunk inference with chunk
offsets remapped to document offsets and (start, end, word) dedup across
overlapping chunks (app.py:3707-3755), then the same typing cascade and
post-filters as the deterministic path.

Spark-first shape:

* the model is a PER-WORKER SINGLETON (module-level cache keyed by model
  name — loaded once per executor python worker, reused across Arrow
  batches; the closure only ships the model NAME, never weights);
* inference is BATCHED: all chunks of an Arrow batch go to the model in
  one call (list input — what HF pipelines vectorize over);
* everything downstream of the span list (typing cascade, abbreviation /
  gazetteer / user injections, dedup, post-filters) is the SAME code the
  deterministic detector runs (detector.extract_turn(span_fn=...)), so the
  two detectors differ only in where spans come from.

The sandbox has no torch/transformers, so model name "stub" resolves to a
deterministic fake whose spans reproduce the deterministic scanner — which
makes the integration test sharp: the neural plumbing (chunk → batched
infer → offset remap → dedup) must reproduce the deterministic path's
mentions exactly on texts short enough to avoid chunk-boundary effects,
and within the overlap tolerance on long ones. A real deployment passes
the HF model name; the import is attempted lazily and fails with a clear
message here.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import pandas as pd

from ..detector import (
    DEFAULT_CONFIDENCE_THRESHOLD,
    _scan_spans,
    compile_user_patterns,
    extract_turn,
)
from .extract import EXTRACTION_STRUCT

MAX_TOKENS = 512
OVERLAP = 50

# per-worker singletons: {model_name: callable chunks -> [[span dict]]}
_MODEL_CACHE: Dict[str, object] = {}


def chunk_text(
    text: str, max_tokens: int = MAX_TOKENS, overlap: int = OVERLAP
) -> List[Tuple[int, str]]:
    """[(start_char, chunk_text)] — the reference's whitespace-word chunking
    branch (chunk_text fallback, app.py:2867-2894: inner_max = max_tokens-2
    words per chunk, `overlap` words of overlap, start_char recovered by
    searching forward from the previous chunk's end). The HF-tokenizer
    branch (app.py:2896-2943) applies when a real tokenizer is plugged in;
    the word branch is what runs model-free and is tokenizer-compatible in
    shape (a word never has fewer tokens than itself)."""
    if not text:
        return [(0, "")]
    overlap = max(0, min(overlap, max_tokens // 4))
    inner_max = max_tokens - 2  # reserve for CLS/SEP
    words = text.split()
    if len(words) <= inner_max:
        return [(0, text)]
    chunks: List[Tuple[int, str]] = []
    start_idx = 0
    search_start = 0
    while start_idx < len(words):
        end_idx = min(len(words), start_idx + inner_max)
        chunk_str = " ".join(words[start_idx:end_idx])
        start_char = text.find(chunk_str, search_start)
        if start_char < 0:
            start_char = sum(len(w) + 1 for w in words[:start_idx])
        chunks.append((start_char, chunk_str))
        if end_idx == len(words):
            break
        search_start = start_char + 1
        start_idx = max(end_idx - overlap, start_idx + 1)
    return chunks


class StubTokenClassifier:
    """Deterministic stand-in for an HF token-classification pipeline.

    Emits HF-shaped predictions ({entity_group, score, word, start, end})
    from the SAME combined-alternation scan the deterministic detector uses
    — so the neural plumbing's output is directly comparable to the
    deterministic path's. Accepts a list of texts (batched call), like an
    HF pipeline, and mirrors the tokenizer vocab-extension surface
    (get_vocab/add_tokens) so X8 exercises real bookkeeping."""

    def __init__(self):
        self._vocab: dict = {}
        self._ner_added_tokens: List[str] = []

    def get_vocab(self) -> dict:
        return dict(self._vocab)

    def add_tokens(self, tokens: List[str]) -> int:
        added = 0
        for t in tokens:
            if t not in self._vocab:
                self._vocab[t] = len(self._vocab)
                added += 1
        return added

    def __call__(self, texts: List[str]) -> List[List[dict]]:
        out = []
        for text in texts:
            preds = []
            for start, end, word, hint, conf in _scan_spans(text or ""):
                preds.append(
                    {
                        "entity_group": hint,
                        "score": conf,
                        "word": word,
                        "start": start,
                        "end": end,
                    }
                )
            out.append(preds)
        return out


class _HFBatchedPipeline:
    """Thin adapter: HF pipeline -> list-in/list-of-lists-out contract."""

    def __init__(self, model_name: str):
        try:
            from transformers import pipeline  # noqa: F401
        except ImportError as e:  # pragma: no cover - no transformers here
            raise ImportError(
                "transformers/torch are required for neural detection with "
                f"model '{model_name}'; use detector='neural:stub' in this "
                "environment (deterministic fake with identical plumbing)"
            ) from e
        from transformers import pipeline

        self._pipe = pipeline(
            "token-classification",
            model=model_name,
            aggregation_strategy="simple",
        )

    def __call__(self, texts: List[str]) -> List[List[dict]]:  # pragma: no cover
        if not texts:
            return []
        preds = self._pipe(list(texts), batch_size=32)
        if texts and isinstance(preds, list) and preds and isinstance(preds[0], dict):
            preds = [preds]  # single-text call returns a flat list
        return [
            [
                {
                    "entity_group": p.get("entity_group", ""),
                    "score": float(p.get("score", 0.0)),
                    "word": p.get("word", ""),
                    "start": int(p.get("start", 0)),
                    "end": int(p.get("end", 0)),
                }
                for p in (batch or [])
            ]
            for batch in preds
        ]


def get_model(model_name: str):
    """Per-worker model singleton (the reference loads once per process,
    app.py:1249-1416; here once per executor python worker)."""
    if model_name not in _MODEL_CACHE:
        if model_name == "stub":
            _MODEL_CACHE[model_name] = StubTokenClassifier()
        else:
            _MODEL_CACHE[model_name] = _HFBatchedPipeline(model_name)
    return _MODEL_CACHE[model_name]


def ensure_vocab_extension(model, tokens) -> int:
    """X8 — tokenizer vocab extension (app.py:3425-3447 static domain
    tokens; app.py:3676-3686 corpus-discovered abbreviations): add every
    token absent from the vocab (case-insensitive) and not already added,
    resize embeddings when anything was added, and track the added set in
    ``_ner_added_tokens`` exactly like the reference. Idempotent — safe to
    call per Arrow batch on the worker singleton. Returns #added."""
    tok_owner = model
    resize_target = None
    pipe = getattr(model, "_pipe", None)
    if pipe is not None:  # HF adapter: extend the real tokenizer/model
        tok_owner = pipe.tokenizer
        resize_target = pipe.model
    vocab = set()
    if hasattr(tok_owner, "get_vocab"):
        vocab = set(tok_owner.get_vocab().keys())
    existing = set(getattr(tok_owner, "_ner_added_tokens", []))
    new_tokens = [
        t
        for t in tokens
        if t and t not in vocab and t.lower() not in vocab and t not in existing
    ]
    if not new_tokens:
        return 0
    num_added = tok_owner.add_tokens(new_tokens)
    if num_added > 0 and resize_target is not None:  # pragma: no cover
        resize_target.resize_token_embeddings(len(tok_owner))
    tok_owner._ner_added_tokens = sorted(existing.union(new_tokens))
    return num_added


def harvest_abbreviation_tokens(transcripts, text_col: str = "text") -> List[str]:
    """Corpus-global abbreviation harvest feeding X8 (the reference
    pre-scans prepared_records for abbreviation_tokens, app.py:3676-3681).

    Spark shape: filter to turns that can define an abbreviation (literal
    parenthesis — the same fast-path predicate preprocess_text uses, pushed
    into the scan), ONE Arrow-batched UDF running the shared
    preprocess_text, explode + distinct. The result is a vocabulary-scale
    dimension (like the canonical map), so collecting it is a broadcast-
    scale judgement call, returned as a sorted list for determinism."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..detector import preprocess_text

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _abbrs(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: sorted(preprocess_text(str(t))[1].keys()) if t else []
        )

    rows = (
        transcripts.filter(F.col(text_col).contains("("))
        .select(F.explode(_abbrs(F.col(text_col))).alias("tok"))
        .distinct()
        .collect()
    )
    return sorted(r["tok"] for r in rows)


def spans_from_predictions(
    work_text: str, chunk_preds: List[Tuple[int, List[dict]]]
) -> List[Tuple[int, int, str, str, float]]:
    """Remap per-chunk predictions to document offsets with cross-chunk
    (start, end, word) dedup (app.py:3738-3755); sorted like _scan_spans so
    the shared per-type first-only dedup downstream is deterministic."""
    seen = set()
    spans: List[Tuple[int, int, str, str, float]] = []
    for chunk_start, preds in chunk_preds:
        for p in preds:
            s = chunk_start + int(p.get("start", 0))
            e = chunk_start + int(p.get("end", 0))
            if s >= e:
                continue
            word = work_text[s:e]
            key = (s, e, word.lower())
            if key in seen:
                continue
            seen.add(key)
            spans.append(
                (s, e, word, str(p.get("entity_group") or ""), float(p.get("score", 0.0)))
            )
    spans.sort(key=lambda t: (t[0], t[1], t[2].lower()))
    return spans


def neural_span_fn(model) -> "callable":
    """work_text -> spans, via chunk -> ONE batched inference -> remap."""

    def _fn(work_text: str):
        chunks = chunk_text(work_text)
        preds = model([c for _, c in chunks])
        return spans_from_predictions(
            work_text, list(zip([s for s, _ in chunks], preds))
        )

    return _fn


def neural_extraction_udf(
    model_name: str = "stub",
    confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD,
    user_entities: Optional[List[Tuple[str, str]]] = None,
    reference_strict: bool = False,
    added_tokens: Optional[List[str]] = None,
):
    """Arrow-batched extraction UDF with the neural span source. Ships only
    the model NAME (plus the small X8 vocab-extension token list); the
    worker resolves the model through the singleton cache and applies the
    vocab extension idempotently."""
    from pyspark.sql import functions as F

    user_entities = list(user_entities or [])
    added_tokens = list(added_tokens or [])

    @F.pandas_udf(EXTRACTION_STRUCT)
    def _extract(texts: pd.Series) -> pd.DataFrame:
        from ..detector import preprocess_text

        model = get_model(model_name)
        if added_tokens:
            ensure_vocab_extension(model, added_tokens)
        patterns = compile_user_patterns(user_entities) if user_entities else None
        # Phase 1 — ONE inference call for the whole Arrow batch: chunk
        # every turn, flatten, infer, regroup. (preprocess_text runs again
        # inside extract_turn; it is regex-cheap next to model inference.)
        work_texts = [
            preprocess_text(str(t))[0] if t is not None and str(t).strip() else ""
            for t in texts
        ]
        all_chunks = [chunk_text(w) if w else [] for w in work_texts]
        flat = [c for chunks in all_chunks for _, c in chunks]
        flat_preds = model(flat) if flat else []
        pred_iter = iter(flat_preds)
        spans_per_text = [
            spans_from_predictions(
                w, [(start, next(pred_iter)) for start, _ in chunks]
            )
            for w, chunks in zip(work_texts, all_chunks)
        ]
        mentions_out = []
        abbrevs_out = []
        for text, spans in zip(texts, spans_per_text):
            result = extract_turn(
                text,
                confidence_threshold=confidence_threshold,
                user_patterns=patterns,
                reference_strict=reference_strict,
                span_fn=lambda _wt, _spans=spans: _spans,
            )
            mentions_out.append(
                [
                    (
                        m.entity,
                        m.entity_norm,
                        m.entity_type,
                        float(m.confidence),
                        m.start,
                        m.end,
                        m.canonical_acr,
                        bool(m.is_user_entity),
                    )
                    for m in result.mentions
                ]
            )
            abbrevs_out.append(list(result.abbreviations))
        return pd.DataFrame(
            {"mentions": mentions_out, "abbreviations": abbrevs_out}
        )

    return _extract

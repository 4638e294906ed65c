"""Real embedding model behind the T9 seam (SURVEY §2.4 T9, §7 Phase 3).

The reference embeds with ``intfloat/e5-large-v2`` via local
sentence-transformers or an HTTP endpoint
(``doc-ingest-chat/utils/llm_setup.py:74-101``,
``services/database.py:155-159``), with E5's asymmetric instruction
prefixes -- documents are encoded as ``"passage: <text>"`` and search
queries as ``"query: <text>"`` (``producer_graph.py:91-99``) -- and
``normalize_embeddings=True`` so cosine == dot product downstream.

This module fills the pluggable slot :func:`embedding.embed_map_in_pandas`
always had: a ``list[str] -> list[list[float]]`` callable. It is split
in two layers so the seam is testable without the model weights:

- :func:`e5_encoder` -- the SEAM LOGIC (prefixing, micro-batch passthrough,
  L2 normalization) around ANY raw encode callable. This layer is pure
  and unit-tested in-container with a deterministic fake backend.
- :func:`sentence_transformer_model` -- the PRODUCTION BACKEND: lazily
  loads a ``SentenceTransformer`` once per executor process (the
  callable pickled to workers carries only the model name / device
  strings, never torch state) and hands its ``encode`` to
  :func:`e5_encoder`. Gated behind an import-try; raises with the exact
  missing-package name when sentence-transformers is absent (this
  container), and the e2e test ``pytest.importorskip``s accordingly.

Swap-in is zero-plan-change::

    embed_map_in_pandas(docs, model=sentence_transformer_model())
"""

from __future__ import annotations

import math
from collections.abc import Callable

RawEncoder = Callable[[list[str]], list[list[float]]]

E5_MODEL = "intfloat/e5-large-v2"  # reference default (llm_setup.py:74-101)
PASSAGE_PREFIX = "passage: "       # producer_graph.py:91-99
QUERY_PREFIX = "query: "


def _l2_normalize(vec: list[float]) -> list[float]:
    norm = math.sqrt(sum(v * v for v in vec))
    if norm == 0.0:
        return [0.0] * len(vec)
    return [v / norm for v in vec]


def e5_encoder(
    raw: RawEncoder,
    *,
    query: bool = False,
    normalize: bool = True,
    backend_normalizes: bool = False,
) -> RawEncoder:
    """Wrap a raw batch-encode callable with the E5 serving contract:
    prefix every text (``passage:`` for corpus docs, ``query:`` for
    search queries), pass the whole micro-batch through in ONE backend
    call (the backend owns intra-batch parallelism), and L2-normalize
    the outputs unless the backend already did
    (``normalize_embeddings=True`` semantics -- cosine becomes dot
    product for every downstream index)."""
    prefix = QUERY_PREFIX if query else PASSAGE_PREFIX

    def encode(texts: list[str]) -> list[list[float]]:
        vecs = raw([prefix + (t or "") for t in texts])
        if len(vecs) != len(texts):
            raise ValueError(
                f"encoder returned {len(vecs)} vectors for "
                f"{len(texts)} texts"
            )
        if normalize and not backend_normalizes:
            vecs = [_l2_normalize(list(v)) for v in vecs]
        return [list(map(float, v)) for v in vecs]

    return encode


# one loaded model per (process, model_name, device): executors reuse
# the instance across Arrow batches and tasks; the driver never
# serializes torch state because the pickled closure holds strings only
_ST_CACHE: dict = {}


def _load_st(model_name: str, device: str | None):
    key = (model_name, device)
    if key not in _ST_CACHE:
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise ImportError(
                "sentence-transformers is not installed; the T9 real-"
                "model path needs the 'sentence-transformers' package "
                "(the deterministic stub in operators/embedding.py "
                "serves hermetic runs)"
            ) from exc
        _ST_CACHE[key] = SentenceTransformer(model_name, device=device)
    return _ST_CACHE[key]


def sentence_transformer_model(
    model_name: str = E5_MODEL,
    *,
    device: str | None = None,
    query: bool = False,
    normalize: bool = True,
) -> RawEncoder:
    """Production T9 backend: a pickle-safe callable for
    ``embed_map_in_pandas(model=...)`` that lazily loads
    ``model_name`` once per executor process and encodes each
    micro-batch with the reference's serving semantics
    (``normalize_embeddings=True``, E5 prefixes)."""

    def raw(texts: list[str]) -> list[list[float]]:
        model = _load_st(model_name, device)
        out = model.encode(
            texts, normalize_embeddings=normalize, show_progress_bar=False
        )
        return [list(map(float, v)) for v in out]

    # the backend normalizes when asked; the wrapper must not re-do it
    return e5_encoder(
        raw, query=query, normalize=normalize, backend_normalizes=True
    )

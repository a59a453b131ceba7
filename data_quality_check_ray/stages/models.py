"""Stateful model stages = actor pools.

Callable classes for ``map_batches(Cls, concurrency=(lo, hi), batch_size=B,
num_cpus=1)``: the model tables are built ONCE per actor in ``__init__``
(pinned state — the fix for the reference rebuilding its descriptor pool on
every request, data-quality-server/src/handlers.rs:113-123) and each
``__call__`` is a fully vectorized batch score.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import langid_model, lm


class LangIdStage:
    """fastText-style char-trigram language ID (langid_model.py)."""

    def __init__(self) -> None:
        langid_model.build_logprob()  # force model build in actor init

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, scores = langid_model.langid_scores(batch["text_effective"])
        batch = batch.append_column(
            "lang_pred", pa.array([str(p) for p in preds], type=pa.string())
        )
        return batch.append_column("lang_score", pa.array(scores, type=pa.float32()))


class PerplexityStage:
    """Hashed word-bigram LM perplexity (lm.py, CCNet-style)."""

    def __init__(self) -> None:
        lm.build_tables()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ppl = lm.ppl_batch(batch["text_effective"])
        return batch.append_column("ppl", pa.array(ppl, type=pa.float32()))


class QualityModelStage:
    """The fused scoring stage: heuristics + langid + perplexity + scrub +
    decide in ONE actor pool.

    One pool instead of chained pools: with multiple small actor pools the
    streaming pipeline forms bubbles (each pool caps its stage's
    parallelism while other CPUs idle) — measured 7x slower on 32 CPUs.
    All models are pinned per actor in ``__init__``; every kernel inside is
    the same vectorized code the standalone stages use, so label parity is
    unchanged."""

    def __init__(self, cfg=None) -> None:
        from ..config import PipelineConfig
        from ..pipelines.quality import make_post_stage

        cfg = cfg or PipelineConfig()
        self._post = make_post_stage(cfg)
        self._langid = LangIdStage()
        self._ppl = PerplexityStage()
        self._clock = None
        if getattr(cfg, "stage_metrics", False):
            from ..state.stage_metrics import StageClock, get_collector

            self._clock = StageClock(get_collector())

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.textstats import text_stats, tokenize

        if pa.types.is_dictionary(batch.schema.field("text_effective").type):
            # cfg.dict_boundary experiment: decode ONCE at stage entry so
            # every kernel below sees the same plain string column
            i = batch.schema.get_field_index("text_effective")
            typ = batch.schema.field("text_effective").type.value_type
            dec = pc.cast(batch["text_effective"].combine_chunks(), typ)
            batch = batch.set_column(i, "text_effective", dec)
        if self._clock is None:
            pre = tokenize(batch["text_effective"])  # ONE tokenization pass
            for name, arr in text_stats(batch["text_effective"], pre=pre).items():
                batch = batch.append_column(name, pa.array(arr))
            batch = self._langid(batch)
            ppl = lm.ppl_batch(batch["text_effective"], pre=pre)
            batch = batch.append_column("ppl", pa.array(ppl, type=pa.float32()))
            return self._post(batch)

        # instrumented path: identical kernels, per-BATCH phase timings
        # (reference analog: json_validation.rs:62-83 observes around each
        # validation step)
        with self._clock.timed("tokenize"):
            pre = tokenize(batch["text_effective"])
        with self._clock.timed("heuristics"):
            for name, arr in text_stats(batch["text_effective"], pre=pre).items():
                batch = batch.append_column(name, pa.array(arr))
        with self._clock.timed("langid"):
            batch = self._langid(batch)
        with self._clock.timed("perplexity"):
            ppl = lm.ppl_batch(batch["text_effective"], pre=pre)
            batch = batch.append_column("ppl", pa.array(ppl, type=pa.float32()))
        with self._clock.timed("scrub_decide"):
            out = self._post(batch)
        self._clock.flush()
        return out

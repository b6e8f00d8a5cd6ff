"""Declarative, resumable curation pipelines — a JSON spec of named
stages compiled onto the engine's own operators, with optional
per-stage Parquet barriers and ``_SUCCESS``-gated resume.

Production corpus curation is a multi-hour chain (strip → rules →
dedup → sample → export); when stage 5 of 7 dies, re-running stages
1-4 wastes the cluster. The genomics side already solved this —
``plans/stages.py`` materializes each step as a Parquet barrier inside
one session and skips completed stages on restart (the reference's
step-resume semantics, ``Pipelines.java:481-555``) — so this runner is
a thin compiler from a spec like::

    {"stages": [
        {"op": "strip_markup"},
        {"op": "gopher_rules", "min_words": 30},
        {"op": "exact_dedup"},
        {"op": "temperature_mix", "alpha": 0.5, "budget_frac": 0.5}
    ]}

onto those barriers. Every stage is corpus-in → corpus-out over the
SAME document schema (id + text + whatever rides along), so stages
compose in any order; the operator families with other shapes are
adapted:

- **transformers** (``strip_markup``, ``redact_pii``, ``line_dedup``)
  emit a projection with a new text column — the runner swaps it in by
  an id-join, keeping every other column;
- **rule flaggers** (``gopher_rules``, ``c4_rules``, ``fineweb_rules``,
  ``quality_filter``, ``lang_filter``) emit per-doc verdicts — the
  runner keeps the flagged-keep ids (semi-join, id-only exchange);
- **survivor ops** (``exact_dedup``, ``minhash_dedup``,
  ``hash_sample``) are already corpus-in → corpus-out;
- **selection ops** (``temperature_mix``) emit thin kept-id relations
  — semi-join.

Scale shape: every adapter join is id-keyed, but the transformer and
keep-and-swap adapters place the upstream corpus on BOTH join sides,
which in a fully lazy chain would re-execute the whole upstream plan
per stage (exponential in chain depth). With ``workdir`` the barrier
write cuts that lineage per stage; without it, each stage output is
``localCheckpoint(eager=False)``-ed (the ``webcurate.py`` device) so
the chain computes each stage exactly once while staying lazy until
the first action.

Barrier names embed a hash of the spec PREFIX up to that stage (op +
params + column names): editing any stage's params — or any upstream
stage — changes the downstream barrier names, so a resumed run with
an edited spec rebuilds exactly the invalidated suffix instead of
silently serving stale results. Orphaned barriers from the old spec
stay on disk (inert) until the workdir is cleaned.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reflexiv_spark.plans.stages import stage


def _swap_text(op: Callable, out_col: str | None):
    """Transformer adapter: run ``op`` on (id, text), swap its output
    column in as the new text, keep every other input column.
    ``out_col=None`` means the op names its output after ``text_col``
    (strip_markup does)."""

    def run(df: DataFrame, text_col: str, id_col: str, **params):
        oc = text_col if out_col is None else out_col
        new = op(df, text_col=text_col, id_col=id_col, **params).select(
            id_col, F.col(oc).alias("__new_text")
        )
        return (
            df.join(new, id_col)
            .withColumn(text_col, F.col("__new_text"))
            .drop("__new_text")
        )

    return run


def _keep_flag(op: Callable):
    """Rule-bundle adapter: keep the rows the bundle's ``keep`` flag
    admits (id-only semi-join; the verdict columns are not carried)."""

    def run(df: DataFrame, text_col: str, id_col: str, **params):
        kept = (
            op(df, text_col=text_col, id_col=id_col, **params)
            .where(F.col("keep"))
            # the rule bundles name their id column literally "id"
            .select(F.col("id").alias(id_col))
        )
        return df.join(kept, id_col, "left_semi")

    return run


def _keep_and_swap(op: Callable, out_col: str):
    """Rule-bundle adapter for bundles whose output text differs from
    the input (C4 removes lines): keep the flagged rows AND swap the
    bundle's cleaned text in — admitting a document on the basis of
    text the pipeline then doesn't use would be wrong."""

    def run(df: DataFrame, text_col: str, id_col: str, **params):
        kept = (
            op(df, text_col=text_col, id_col=id_col, **params)
            .where(F.col("keep"))
            .select(F.col("id").alias(id_col),
                    F.col(out_col).alias("__new_text"))
        )
        return (
            df.join(kept, id_col)
            .withColumn(text_col, F.col("__new_text"))
            .drop("__new_text")
        )

    return run


def _survivor(op: Callable):
    def run(df: DataFrame, text_col: str, id_col: str, **params):
        return op(df, text_col=text_col, id_col=id_col, **params)

    return run


def _lang_filter(df: DataFrame, text_col: str, id_col: str,
                 langs: list[str] | tuple[str, ...] | str = ("en",)):
    from reflexiv_spark.datapipe.text import language_id

    if isinstance(langs, str):
        # the natural JSON mistake ("langs": "en") would otherwise
        # become isin('e', 'n') and silently empty the corpus
        langs = [langs]

    kept = (
        language_id(df, text_col=text_col, id_col=id_col)
        .where(F.col("pred_lang").isin(list(langs)))
        .select(id_col)
    )
    return df.join(kept, id_col, "left_semi")


def _quality_filter(df: DataFrame, text_col: str, id_col: str,
                    min_score: float = 0.6):
    from reflexiv_spark.datapipe.text import quality_score

    kept = (
        quality_score(df, text_col=text_col, id_col=id_col)
        .where(F.col("quality") >= float(min_score))
        .select(id_col)
    )
    return df.join(kept, id_col, "left_semi")


def _temperature_mix(df: DataFrame, text_col: str, id_col: str, **params):
    from reflexiv_spark.datapipe.sampling import temperature_mix

    kept = temperature_mix(
        df, text_col=text_col, id_col=id_col, **params
    ).select(id_col)
    return df.join(kept, id_col, "left_semi")


def _hash_sample(df: DataFrame, text_col: str, id_col: str, **params):
    from reflexiv_spark.datapipe.sampling import hash_sample

    return hash_sample(df, id_col=id_col, **params)


def _ops() -> dict[str, Callable]:
    # lazy imports: the runner must not import every datapipe module at
    # module load (keeps `import reflexiv_spark` light)
    from reflexiv_spark.datapipe.dedup import exact_dedup, minhash_dedup
    from reflexiv_spark.datapipe.filters import (
        c4_rules,
        fineweb_rules,
        gopher_rules,
    )
    from reflexiv_spark.datapipe.text import (
        drop_frequent_lines,
        redact_pii,
        strip_markup,
    )

    return {
        "strip_markup": _swap_text(strip_markup, None),
        "redact_pii": _swap_text(redact_pii, "redacted"),
        "line_dedup": _swap_text(drop_frequent_lines, "cleaned"),
        "gopher_rules": _keep_flag(gopher_rules),
        "c4_rules": _keep_and_swap(c4_rules, "clean_text"),
        "fineweb_rules": _keep_flag(fineweb_rules),
        "lang_filter": _lang_filter,
        "quality_filter": _quality_filter,
        "exact_dedup": _survivor(exact_dedup),
        "minhash_dedup": _survivor(minhash_dedup),
        "hash_sample": _hash_sample,
        "temperature_mix": _temperature_mix,
    }


def pipeline_ops() -> tuple[str, ...]:
    """The op names a spec may use (also embedded in the compile-time
    unknown-op error message)."""
    return tuple(sorted(_ops()))


def run_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    spec: dict | str,
    workdir: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    resume: bool = True,
) -> DataFrame:
    """Run a ``{"stages": [{"op": name, **params}, ...]}`` spec over the
    corpus. With ``workdir``, every stage materializes at
    ``workdir/NN_op`` with ``_SUCCESS``-gated resume (a restart skips
    completed stages and re-reads their barriers); without it, the
    whole chain is one lazy plan.

    Unknown ops and non-dict stages fail fast at compile time — before
    any Spark job runs — with the list of valid ops.
    """
    if isinstance(spec, str):
        spec = json.loads(spec)
    if not isinstance(spec, dict):
        raise ValueError(
            'spec must be an object with a "stages" list '
            '(got a JSON array? wrap it: {"stages": [...]})'
        )
    stages = spec.get("stages")
    if not isinstance(stages, list) or not stages:
        raise ValueError('spec needs a non-empty "stages" list')
    ops = _ops()
    compiled = []
    for i, st in enumerate(stages):
        if not isinstance(st, dict) or "op" not in st:
            raise ValueError(f'stage {i} must be a dict with an "op" key')
        name = st["op"]
        if name not in ops:
            raise ValueError(
                f"stage {i}: unknown op {name!r}; valid ops: "
                f"{', '.join(sorted(ops))}"
            )
        params = {k: v for k, v in st.items() if k != "op"}
        # text_col/id_col are runner-owned keywords passed to every
        # stage adapter — a spec param with the same name would raise
        # a mid-run TypeError (duplicate keyword) AFTER earlier
        # barriers executed; reject at compile time instead
        reserved = {"text_col", "id_col"} & params.keys()
        if reserved:
            raise ValueError(
                f"stage {i} ({name}): {sorted(reserved)} are "
                "runner-level settings — pass them to run_pipeline "
                "(or the pipeline CLI flags), not inside a stage"
            )
        compiled.append((i, name, params))
    cur = docs
    prefix_key = f"{text_col}|{id_col}"
    for i, name, params in compiled:
        fn = ops[name]
        if workdir is None:
            cur = fn(cur, text_col=text_col, id_col=id_col, **params)
            # cut the lineage so the next stage's self-join does not
            # re-execute this whole chain on both join sides (lazy:
            # materializes once, at the first action)
            cur = cur.localCheckpoint(eager=False)
        else:
            # barrier identity = the spec prefix THROUGH this stage:
            # an edited stage (or any upstream edit) invalidates this
            # and every later barrier, never silently resuming stale
            # results
            prefix_key += "|" + json.dumps(
                {"op": name, **params}, sort_keys=True, default=str
            )
            h = hashlib.md5(prefix_key.encode()).hexdigest()[:8]
            prev = cur
            cur = stage(
                spark,
                f"{i:02d}_{name}_{h}",
                workdir,
                lambda p=prev, f=fn, pr=params: f(
                    p, text_col=text_col, id_col=id_col, **pr
                ),
                resume=resume,
            )
    return cur

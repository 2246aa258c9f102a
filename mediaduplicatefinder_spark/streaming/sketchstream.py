"""Streaming HLL sketch maintenance (E94).

The streaming face of the E75/E92 cardinality channel: as crawl
batches land, maintain per-group HyperLogLog registers incrementally —
"distinct urls seen so far, per group" without ever storing the urls.
The register table IS streaming state: ``groupBy(grp, bucket).max(rho)``
is an associative, commutative aggregate, so Structured Streaming's
incremental execution in update mode computes exactly the batch
registers over the accumulated input (asserted in tests, including
across a checkpoint restart — max-merge makes replayed rows harmless,
so the sketch is effectively-once even under at-least-once delivery).

State size: m rows per group (64 here), independent of stream length —
the sketch property that makes this viable at 10^12 urls where a
streaming ``dropDuplicates`` state would hold every key.

The estimate is NOT computed inside the stream: a foreachBatch /
downstream batch read applies operators.sketches.hll_estimate to the
register sink whenever a number is needed (estimates are not
incremental; registers are).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mediaduplicatefinder_spark.operators.sketches import hll_registers

from pyspark.sql import functions as F


def streaming_hll_registers(
    items: DataFrame, grp_col: str = "grp", url_col: str = "url"
) -> DataFrame:
    """Streaming items(grp, url) -> update-mode register stream
    (grp, bucket, reg).  Works identically on a batch frame (the
    parity tests exploit that)."""
    hashed = items.select(
        F.col(grp_col).alias("grp"),
        F.xxhash64(F.col(url_col)).alias("h"),
    )
    return hll_registers(hashed, ["grp"])


def streaming_cms_grid(
    items: DataFrame,
    grp_col: str = "grp",
    item_col: str = "item",
    weight_col: str | None = None,
    d: int | None = None,
    w: int | None = None,
) -> DataFrame:
    """Streaming count-min maintenance (E135's streaming face): the
    d x w counter grid as aggregation state — ``groupBy(grp, j, col)
    .sum`` is associative+commutative, so incremental execution equals
    the batch grid over the accumulated input (tested, incl. across a
    checkpoint restart). State stays <= d*w rows per group forever.

    One honesty note vs the HLL stream above: SUM is not idempotent —
    the replay-safety here comes from the file source's exactly-once
    offset tracking in the checkpoint, not from the merge function
    (HLL's max forgives at-least-once delivery; a counter does not).
    Deployments feeding this from an at-least-once bus must dedupe
    batch ids upstream; the checkpoint-restart test pins the
    file-source guarantee this module relies on."""
    from mediaduplicatefinder_spark.operators.cms import (
        CMS_D,
        CMS_W,
        cms_build,
    )

    return cms_build(
        items,
        item_col=item_col,
        weight_col=weight_col,
        group_cols=[grp_col],
        d=d or CMS_D,
        w=w or CMS_W,
    )

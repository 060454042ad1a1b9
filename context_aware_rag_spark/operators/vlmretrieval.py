"""VLM retrieval frame assembly (reference functions/rag/vlm_retrieval/
vlm_retrieval_func.py:1-352 + tools/image/image_fetcher.py:222-320):
retrieve caption documents by semantic similarity, fetch each one's
frames from its asset directory, uniformly sample
``num_frames_per_chunk`` of them, and assemble the VLM message list —
one "Image metadata: (Timestamp: HH:MM:SS to HH:MM:SS)" text entry per
document followed by one data-URL image entry per sampled frame
(_extract_images_from_documents :116-175, _get_vlm_response :177-252).

Engine mapping onto the multimodal table (operators/multimodal.py):

- a retrieved document has frames only when its media row is
  kind == 'video' — the reference skips documents without an
  ``asset_dir`` the same way (vlm_retrieval_func.py:139-147 logs and
  appends nothing);
- the asset directory's frame census is the frame_sample_plan
  convention: one frame per second of ``meta.duration_ms``, at least 1;
- timestamps: start_pts = media_id seconds in ns, end = start +
  duration; ns_to_hms is the reference's integer-division formatter
  (vlm_retrieval_func.py:120-127);
- frame payloads: the decode/encode of real JPEG bytes is the stubbed
  multimodal leg (the container has no codec libs); the data URL wraps
  the deterministic per-frame byte string instead, keeping the
  partitioning/ordering/batch shape real.

Uniform sampling replicates image_fetcher.py:265-287 EXACTLY,
including Python's ``int(round(...))`` banker's rounding at half
values: index i maps to round-half-even(i*(T-1)/(k-1)), computed in
pure integer arithmetic so Spark and the SQL twin agree bit-for-bit
(float round() is half-up in both engines and would diverge from the
reference whenever i*(T-1) is an exact half multiple of k-1);
k == 1 takes the middle frame T div 2 (:273-274).

100 TB shape: retrieval is the ann broadcast-query scan; frame
explosion is a JVM ``posexplode(sequence(...))`` bounded by k per
document — never by the asset dir's true frame count — so output rows
are exactly |retrieved docs| x (k+1). No Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_FRAMES_PER_CHUNK = 30  # reference utils/globals.py:42


def ns_to_hms(ns: Column) -> Column:
    """vlm_retrieval_func.py:120-127 — ns → "HH:MM:SS" via integer
    division (hours field widens past 99 like Python's :02d)."""
    secs = (ns / F.lit(1_000_000_000)).cast("long")
    h = (secs / 3600).cast("long")
    m = ((secs % 3600) / 60).cast("long")
    s = secs % 60
    pad = lambda c: F.lpad(c.cast("string"), 2, "0")  # noqa: E731
    return F.concat_ws(":", pad(h), pad(m), pad(s))


def _half_even_index(i: Column, t: Column, k: int) -> Column:
    """round-half-even(i * (t-1) / (k-1)) in exact integer arithmetic —
    Python's int(round(...)) at image_fetcher.py:281-284."""
    num = i * (t - 1)
    den = F.lit(k - 1)
    q = F.floor(num / den).cast("long")
    r = num - q * den
    round_up = (2 * r > den) | ((2 * r == den) & (q % 2 == 1))
    return (q + F.when(round_up, 1).otherwise(0)).cast("int")


def vlm_frame_assembly(
    retrieved: DataFrame,
    media: DataFrame,
    num_frames_per_chunk: int = DEFAULT_NUM_FRAMES_PER_CHUNK,
    every_ms: int = 1000,
) -> DataFrame:
    """Assemble the VLM message rows for a ranked retrieval set.

    ``retrieved``: (rank, doc_id) — the vector-retrieval output;
    ``media``: the multimodal table (media_id, kind, payload, meta).

    Returns one row per message entry: (rank, media_id, msg_idx,
    msg_type, content, start_time, end_time, frame_idx) — msg_idx 0 is
    the per-document metadata text, 1..k the sampled frames, ordered
    exactly like the reference's image_message_list
    (vlm_retrieval_func.py:185-224)."""
    k = int(num_frames_per_chunk)
    if k < 1:
        raise ValueError(f"need num_frames_per_chunk >= 1, got {k}")

    vids = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.col("meta.duration_ms").alias("duration_ms"),
        # payload for video rows is the opaque byte string; frames wrap
        # a per-frame slice of it (the stubbed-decode contract)
        F.decode(F.col("payload"), "utf-8").alias("_ptext"),
    )
    docs = retrieved.select("rank", F.col("doc_id").alias("media_id")).join(
        vids, "media_id"
    )
    start_ns = (F.col("media_id") * F.lit(1_000_000_000)).cast("long")
    end_ns = start_ns + F.col("duration_ms").cast("long") * F.lit(1_000_000)
    t = F.greatest(
        (F.col("duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    docs = docs.select(
        "rank", "media_id", "_ptext",
        ns_to_hms(start_ns).alias("start_time"),
        ns_to_hms(end_ns).alias("end_time"),
        t.alias("_t"),
    )

    meta_rows = docs.select(
        "rank", "media_id",
        F.lit(0).alias("msg_idx"),
        F.lit("text").alias("msg_type"),
        F.concat(
            F.lit("Image metadata: (Timestamp: "),
            F.col("start_time"), F.lit(" to "), F.col("end_time"),
            F.lit(")\n"),
        ).alias("content"),
        "start_time", "end_time",
        F.lit(None).cast("int").alias("frame_idx"),
    )

    sampled = docs.select(
        "rank", "media_id", "_ptext", "start_time", "end_time", "_t",
        F.posexplode(
            F.sequence(F.lit(0), F.least(F.lit(k), F.col("_t")) - 1)
        ).alias("_i", "_"),
    )
    if k == 1:
        frame_idx = (F.col("_t") / 2).cast("int")  # middle frame, :273-274
    else:
        # sample only when T > k (image_fetcher.py:266-271); otherwise
        # every frame ships in order
        frame_idx = F.when(
            F.col("_t") > k,
            _half_even_index(F.col("_i").cast("long"), F.col("_t").cast("long"), k),
        ).otherwise(F.col("_i").cast("int"))
    frame_rows = sampled.select(
        "rank", "media_id",
        (F.col("_i") + 1).cast("int").alias("msg_idx"),
        F.lit("image_url").alias("msg_type"),
        F.concat(
            F.lit("data:image/jpeg;base64,"),
            # Spark's base64() is MIME (RFC 2045): CRLF-wrapped every 76
            # chars; a data URL needs the unwrapped RFC 4648 form (what
            # Python b64encode emits in the reference, :299)
            F.regexp_replace(
                F.base64(
                    F.encode(
                        F.concat_ws(
                            "#", F.col("_ptext"),
                            F.concat(F.lit("frame_"), frame_idx.cast("string")),
                        ),
                        "utf-8",
                    )
                ),
                "\r\n",
                "",
            ),
        ).alias("content"),
        "start_time", "end_time",
        frame_idx.alias("frame_idx"),
    )
    return meta_rows.unionByName(frame_rows)

"""Per-document delete with orphan cleanup (the reference's live-KG
maintenance path).

Reference: QUERY_TO_DELETE_UUID_GRAPH (constants.py:406-443) — for a
document uuid, collect its chunks, find entities whose every HAS_ENTITY
link comes from those chunks (``NOT EXISTS`` a link from any other
chunk), find summaries likewise via IN_SUMMARY, then DETACH DELETE the
document + chunks + orphaned entities/summaries.

Spark shape: the survivor rule is two semi/anti joins per containment
relation —

    orphan(e)  ⟺  e linked from a deleted chunk
               AND NOT ∃ link to e from a surviving chunk

— then one anti-join on each of nodes/edges against the deleted-id set.
No driver-side row data; the deleted-id set scales with the deleted
documents (not the corpus) and every join is a plain equi-join the
planner can broadcast when runtime stats allow (never forced: a bulk
delete can cover millions of chunks).

DETACH semantics: edges touching any deleted node id are removed;
surviving node rows are untouched (the reference's DETACH DELETE does
not rewrite properties of surviving nodes either).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# relations whose dst is deleted when its last surviving src-chunk goes
# away (reference handles HAS_ENTITY for entities, IN_SUMMARY for
# summaries — constants.py:415-436)
ORPHAN_RELS = ("HAS_ENTITY", "IN_SUMMARY")


class DeleteResult(NamedTuple):
    nodes: DataFrame
    edges: DataFrame
    deleted_node_ids: DataFrame  # (node_id) — docs + chunks + orphans


def deleted_id_set(
    edges: DataFrame,
    doc_ids: DataFrame,
    orphan_rels: Sequence[str] = ORPHAN_RELS,
) -> DataFrame:
    """All node ids the delete removes: the documents, their PART_OF
    chunks, and every orphan_rels target linked ONLY from those chunks.

    ``doc_ids`` is a one-column DataFrame (node_id).
    """
    docs = doc_ids.select(F.col(doc_ids.columns[0]).alias("node_id")).distinct()
    del_chunks = (
        edges.filter(F.col("rel_type") == "PART_OF")
        .join(docs.withColumnRenamed("node_id", "dst"), "dst", "left_semi")
        .select(F.col("src").alias("node_id"))
        .distinct()
    )
    containment = edges.filter(F.col("rel_type").isin(*orphan_rels)).select(
        "src", "dst"
    )
    linked_from_deleted = containment.join(
        del_chunks.withColumnRenamed("node_id", "src"), "src", "left_semi"
    ).select("dst")
    linked_from_surviving = containment.join(
        del_chunks.withColumnRenamed("node_id", "src"), "src", "left_anti"
    ).select("dst")
    orphans = (
        linked_from_deleted.join(linked_from_surviving, "dst", "left_anti")
        .select(F.col("dst").alias("node_id"))
        .distinct()
    )
    return docs.unionByName(del_chunks).unionByName(orphans).distinct()


def delete_documents(
    nodes: DataFrame,
    edges: DataFrame,
    doc_ids: DataFrame,
    orphan_rels: Sequence[str] = ORPHAN_RELS,
) -> DeleteResult:
    """Remove documents + their chunks + orphaned entities/summaries
    from (nodes, edges); DETACH-delete every edge touching a removed id.

    ``nodes`` needs a ``node_id`` column; ``edges`` needs
    (src, dst, rel_type). Extra columns pass through untouched.
    """
    deleted = deleted_id_set(edges, doc_ids, orphan_rels).localCheckpoint()
    nodes2 = nodes.join(deleted, "node_id", "left_anti")
    edges2 = edges.join(
        deleted.withColumnRenamed("node_id", "src"), "src", "left_anti"
    ).join(deleted.withColumnRenamed("node_id", "dst"), "dst", "left_anti")
    # restore caller column order (joins moved the key columns first)
    edges2 = edges2.select(*edges.columns)
    return DeleteResult(nodes=nodes2, edges=edges2, deleted_node_ids=deleted)


def delete_conversations(
    nodes: DataFrame, edges: DataFrame, conv_ids: Sequence[str]
) -> DeleteResult:
    """Convenience wrapper: delete by conversation id (the pipeline's
    document node id IS the conv_id — linking.structural_edges PART_OF
    dst)."""
    spark = nodes.sparkSession
    docs = spark.createDataFrame([(c,) for c in conv_ids], ["node_id"])
    return delete_documents(nodes, edges, docs)

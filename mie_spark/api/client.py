"""MieClient — the knowledge-graph memory API, Spark-first.

Reproduces the reference's memory layer semantics (pkg/memory/{reader,
writer,conflicts}.go) over MieStore tables. Every read is a DataFrame
plan (filters/joins/top-k stay declarative for Catalyst); writes are
key-upserts with content-hash identity, embeddings written
synchronously (the reference writes them fire-and-forget,
writer.go:71-73 — synchronous keeps tests deterministic; SURVEY §2.7 V6).

Deliberate semantic fix, documented in SURVEY §2.10: `threshold`
ALWAYS means minimum cosine *similarity* here. The reference's
conflicts tool documents similarity but consumes it as a distance
bound (tools/conflicts.go:20-22 vs memory/conflicts.go:95).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mie_spark import ids
from mie_spark import validators as V
from mie_spark.embedding import MockEmbeddingProvider
from mie_spark.functions.vectors import cosine_sim
from mie_spark.schemas import (
    EDGE_TABLES,
    EMBEDDING_TABLES,
    NODE_TABLES,
    key_columns,
)
from mie_spark.storage import MieStore, now_s

# node table → its embedding table + the text that gets embedded
_EMBED_SOURCE = {
    "mie_fact": ("mie_fact_embedding", "fact_id"),
    "mie_decision": ("mie_decision_embedding", "decision_id"),
    "mie_entity": ("mie_entity_embedding", "entity_id"),
    "mie_event": ("mie_event_embedding", "event_id"),
}

# embedding input text per node table — must stay in lockstep with the
# store_* methods' _store_embedding calls below
_EMBED_TEXT = {
    "mie_fact": lambda r: r.get("content") or "",
    "mie_decision": lambda r: f"{r.get('title') or ''} {r.get('rationale') or ''}",
    "mie_entity": lambda r: f"{r.get('name') or ''} {r.get('description') or ''}",
    "mie_event": lambda r: f"{r.get('title') or ''} {r.get('description') or ''}",
}

# exact-search columns per node type (reader.go:138-162: content for
# facts; two-column OR for the rest)
_SEARCH_COLS = {
    "mie_fact": ("content",),
    "mie_decision": ("title", "rationale"),
    "mie_entity": ("name", "description"),
    "mie_event": ("title", "description"),
    "mie_topic": ("name", "description"),
}

_TYPE_ALIASES = {
    "fact": "mie_fact",
    "decision": "mie_decision",
    "entity": "mie_entity",
    "event": "mie_event",
    "topic": "mie_topic",
}


class MieClient:
    def __init__(
        self,
        spark: SparkSession,
        path: str | None = None,
        embedder=None,
        embedding_dim: int = 4,
        snapshot_retention: int = 2,
        merge_buckets: int = 16,
    ):
        self.spark = spark
        self.embedder = embedder or MockEmbeddingProvider(embedding_dim)
        self.store = MieStore(
            spark,
            path,
            embedding_dim=embedding_dim,
            snapshot_retention=snapshot_retention,
            merge_buckets=merge_buckets,
        )

    @classmethod
    def from_config(cls, spark: SparkSession, cfg=None) -> "MieClient":
        """Build a client from a discovered .mie/config.yaml (walk-up +
        env overrides, mie_spark/config.py; reference: cmd/mie uses
        LoadConfig on every command, config.go:74-107). The embedding
        provider honors the config when embedding is enabled, else the
        deterministic mock."""
        from mie_spark import embedding as emb
        from mie_spark.config import load_config, resolve_storage_path

        if cfg is None:
            cfg = load_config()
        embedder = None
        dim = cfg.embedding.dimensions
        if cfg.embedding.enabled and cfg.embedding.provider != "mock":
            name = cfg.embedding.provider
            if name == "ollama":
                embedder = emb.OllamaEmbeddingProvider(
                    model=cfg.embedding.model or "nomic-embed-text",
                    base_url=cfg.embedding.base_url or "http://localhost:11434",
                )
            elif name == "openai":
                embedder = emb.OpenAIEmbeddingProvider(
                    model=cfg.embedding.model or "text-embedding-3-small",
                    base_url=cfg.embedding.base_url or "https://api.openai.com/v1",
                    api_key=cfg.embedding.api_key,
                )
            elif name == "nomic":
                embedder = emb.NomicEmbeddingProvider(
                    api_key=cfg.embedding.api_key,
                    model=cfg.embedding.model or "nomic-embed-text-v1.5",
                    base_url=cfg.embedding.base_url
                    or "https://api-atlas.nomic.ai/v1",
                )
            else:
                raise ValueError(f"unknown embedding provider {name!r}")
        return cls(
            spark,
            path=resolve_storage_path(cfg),
            embedder=embedder,
            embedding_dim=dim,
        )

    # ------------------------------------------------------------------
    # write path (writer.go)
    # ------------------------------------------------------------------

    def store_fact(
        self,
        content: str,
        category: str | None = None,
        confidence: float | None = None,
        source_agent: str = "",
        source_conversation: str = "",
    ) -> str:
        category = V.coerce_category(category)
        fid = ids.fact_id(content, category)
        ts = now_s()
        self.store.upsert_rows(
            "mie_fact",
            [
                {
                    "id": fid,
                    "content": content,
                    "category": category,
                    "confidence": V.clamp_confidence(confidence),
                    "source_agent": source_agent,
                    "source_conversation": source_conversation,
                    "valid": True,
                    "created_at": ts,
                    "updated_at": ts,
                }
            ],
        )
        self._store_embedding("mie_fact", fid, content)
        return fid

    def store_decision(
        self,
        title: str,
        rationale: str,
        alternatives: str = "[]",
        context: str = "",
        status: str = "active",
        source_agent: str = "",
        source_conversation: str = "",
    ) -> str:
        V.validate_decision_status(status)
        did = ids.decision_id(title, rationale)
        ts = now_s()
        self.store.upsert_rows(
            "mie_decision",
            [
                {
                    "id": did,
                    "title": title,
                    "rationale": rationale,
                    "alternatives": alternatives or "[]",
                    "context": context,
                    "source_agent": source_agent,
                    "source_conversation": source_conversation,
                    "status": status,
                    "created_at": ts,
                    "updated_at": ts,
                }
            ],
        )
        self._store_embedding("mie_decision", did, f"{title} {rationale}")
        return did

    def store_entity(
        self, name: str, kind: str, description: str = "", source_agent: str = ""
    ) -> str:
        V.validate_entity_kind(kind)
        eid = ids.entity_id(name, kind)
        ts = now_s()
        self.store.upsert_rows(
            "mie_entity",
            [
                {
                    "id": eid,
                    "name": name,
                    "kind": kind,
                    "description": description,
                    "source_agent": source_agent,
                    "created_at": ts,
                    "updated_at": ts,
                }
            ],
        )
        self._store_embedding("mie_entity", eid, f"{name} {description}")
        return eid

    def store_event(
        self,
        title: str,
        description: str = "",
        event_date: str = "",
        source_agent: str = "",
        source_conversation: str = "",
    ) -> str:
        evid = ids.event_id(title, event_date)
        ts = now_s()
        self.store.upsert_rows(
            "mie_event",
            [
                {
                    "id": evid,
                    "title": title,
                    "description": description,
                    "event_date": event_date,
                    "source_agent": source_agent,
                    "source_conversation": source_conversation,
                    "created_at": ts,
                    "updated_at": ts,
                }
            ],
        )
        self._store_embedding("mie_event", evid, f"{title} {description}")
        return evid

    def store_topic(self, name: str, description: str = "") -> str:
        tid = ids.topic_id(name)
        ts = now_s()
        self.store.upsert_rows(
            "mie_topic",
            [
                {
                    "id": tid,
                    "name": name,
                    "description": description,
                    "created_at": ts,
                    "updated_at": ts,
                }
            ],
        )
        return tid

    def _store_embedding(self, node_table: str, node_id: str, text: str) -> None:
        emb_table, id_col = _EMBED_SOURCE[node_table]
        vec = self.embedder.embed([text])[0]
        self.store.upsert_rows(emb_table, [{id_col: node_id, "embedding": vec}])

    def add_relationship(
        self, edge_table: str, from_id: str, to_id: str, **values: str
    ) -> None:
        """Whitelisted edge insert (writer.go:264-310)."""
        if edge_table not in EDGE_TABLES:
            raise ValueError(
                f"invalid edge table {edge_table!r}; valid: {sorted(EDGE_TABLES)}"
            )
        keys, vals = EDGE_TABLES[edge_table]
        if "role" in values:
            V.validate_entity_role(values["role"])
        row = {keys[0]: from_id, keys[1]: to_id}
        for col in vals:
            row[col] = values.get(col, "")
        self.store.upsert_rows(edge_table, [row])

    def invalidate_fact(
        self, new_fact_id: str | None, old_fact_id: str, reason: str = ""
    ) -> None:
        """Flip valid=false on the old fact and — when a superseding
        fact is given — insert the invalidation edge (writer.go:230-261).
        Both writes land in ONE multi-table transaction
        (store.atomic_upsert_rows): the manifest rename commits fact
        update and edge insert together, so readers can never observe
        the fact flipped without its edge or vice versa — closing the
        SURVEY §7 risk-register window the previous ordered-two-MERGE
        form documented. ``new_fact_id=None`` invalidates without a
        replacement: NO edge is written (a self-loop edge claiming the
        fact supersedes itself would corrupt the invalidation chain
        and every export carrying it)."""
        # both ids must be fact ids: get_node_by_id dispatches on the
        # prefix, so an entity/decision id would otherwise fetch a row
        # of the WRONG table and upsert it into mie_fact as garbage
        for nid in (new_fact_id, old_fact_id):
            if nid is not None and ids.node_type_of(nid) != "mie_fact":
                raise ValueError(f"invalidate_fact requires fact ids, got {nid!r}")
        old = self.get_node_by_id(old_fact_id)
        if old is None:
            raise KeyError(f"fact not found: {old_fact_id}")
        old["valid"] = False
        old["updated_at"] = now_s()
        updates: dict[str, list[dict]] = {"mie_fact": [old]}
        if new_fact_id is not None and new_fact_id != old_fact_id:
            updates["mie_invalidates"] = [
                {
                    "new_fact_id": new_fact_id,
                    "old_fact_id": old_fact_id,
                    "reason": reason,
                }
            ]
        self.store.atomic_upsert_rows(updates)

    def update_description(self, node_id: str, description: str) -> None:
        """RMW description update for entity/event/topic (writer.go:313-362)."""
        table = ids.node_type_of(node_id)
        if table not in ("mie_entity", "mie_event", "mie_topic"):
            raise ValueError(f"{table} does not have a description update path")
        row = self.get_node_by_id(node_id)
        if row is None:
            raise KeyError(f"node not found: {node_id}")
        row["description"] = description
        row["updated_at"] = now_s()
        self.store.upsert_rows(table, [row])

    def update_status(self, decision_id: str, status: str) -> None:
        V.validate_decision_status(status)
        row = self.get_node_by_id(decision_id)
        if row is None:
            raise KeyError(f"decision not found: {decision_id}")
        row["status"] = status
        row["updated_at"] = now_s()
        self.store.upsert_rows("mie_decision", [row])

    # ------------------------------------------------------------------
    # read path (reader.go)
    # ------------------------------------------------------------------

    def _fetch_nodes_by_ids(self, node_ids: list[str]) -> dict[str, dict[str, Any]]:
        """Batch point-lookup: ONE filtered scan per node type instead
        of one scan per id (search result assembly is the hot caller —
        a per-id loop costs limit × full scans on the disk engine)."""
        by_table: dict[str, list[str]] = {}
        for nid in node_ids:
            by_table.setdefault(ids.node_type_of(nid), []).append(nid)
        out: dict[str, dict[str, Any]] = {}
        for table, nids in by_table.items():
            for r in (
                self.store.table(table)
                .filter(F.col("id").isin(nids))
                .collect()
            ):
                out[r["id"]] = r.asDict()
        return out

    def get_node_by_id(self, node_id: str) -> dict[str, Any] | None:
        """Point lookup with prefix dispatch (reader.go:308-382)."""
        table = ids.node_type_of(node_id)
        rows = (
            self.store.table(table).filter(F.col("id") == F.lit(node_id)).collect()
        )
        return rows[0].asDict() if rows else None

    def exact_search(
        self,
        query: str,
        node_types: list[str] | None = None,
        limit: int = 50,
        valid_only: bool = True,
    ) -> list[dict[str, Any]]:
        """Substring search (F2/F3): `contains` on the type's text
        columns, two-column OR where the reference ORs
        (reader.go:138-162)."""
        out: list[dict[str, Any]] = []
        for table in self._tables_for(node_types):
            df = self.store.table(table)
            cols = _SEARCH_COLS[table]
            cond = F.col(cols[0]).contains(query)
            for col in cols[1:]:
                cond = cond | F.col(col).contains(query)
            if table == "mie_fact" and valid_only:
                cond = cond & F.col("valid")
            hits = (
                df.filter(cond)
                .orderBy(F.col("created_at").desc(), F.col("id"))
                .limit(limit)
                .collect()
            )
            out.extend({**r.asDict(), "node_type": table} for r in hits)
        return out[:limit]

    def semantic_search(
        self,
        query: str,
        node_types: list[str] | None = None,
        limit: int = 10,
        valid_only: bool = True,
    ) -> list[dict[str, Any]]:
        """Exact top-k cosine over the requested types' embeddings,
        merged and truncated (reader.go:38-119). One unioned plan, one
        TakeOrderedAndProject — no per-type over-fetch (the reference
        needs k·5 because it post-filters `valid` after ANN; we filter
        before ranking)."""
        merged = self._semantic_ranking(query, node_types, valid_only)
        if merged is None:
            return []
        top = (
            merged.orderBy(F.col("similarity").desc(), F.col("node_id"))
            .limit(limit)
            .collect()
        )
        nodes = self._fetch_nodes_by_ids([r["node_id"] for r in top])
        results = []
        for r in top:
            results.append(
                {
                    **nodes.get(r["node_id"], {}),
                    "node_type": r["node_type"],
                    "similarity": float(r["similarity"]),
                    "distance": 1.0 - float(r["similarity"]),
                }
            )
        return results

    def _semantic_ranking(
        self,
        query: str,
        node_types: list[str] | None,
        valid_only: bool,
    ) -> DataFrame | None:
        """(node_id, node_type, similarity) across the requested types'
        embeddings as ONE unioned lazy plan — the shared ranking core of
        semantic_search and hybrid_search."""
        qvec = self.embedder.embed_query(query)
        q = F.array(*[F.lit(float(x)) for x in qvec])
        per_type: list[DataFrame] = []
        for table in self._tables_for(node_types):
            if table == "mie_topic":
                continue  # topics carry no embedding table (schema.go)
            emb_table, id_col = _EMBED_SOURCE[table]
            emb = self.store.table(emb_table)
            nodes = self.store.table(table)
            if table == "mie_fact" and valid_only:
                nodes = nodes.filter(F.col("valid"))
            joined = emb.join(nodes, emb[id_col] == nodes["id"]).select(
                F.col("id").alias("node_id"),
                F.lit(table).alias("node_type"),
                cosine_sim(F.col("embedding"), q).alias("similarity"),
            )
            per_type.append(joined)
        if not per_type:
            return None
        merged = per_type[0]
        for df in per_type[1:]:
            merged = merged.unionByName(df)
        return merged

    def hybrid_search(
        self,
        query: str,
        node_types: list[str] | None = None,
        limit: int = 10,
        valid_only: bool = True,
        k_each: int = 50,
        rrf_k: int = 60,
    ) -> list[dict[str, Any]]:
        """Hybrid retrieval: BM25 keyword ranking over each type's text
        columns fused with the cosine semantic ranking by reciprocal
        rank (score = Σ 1/(rrf_k + rank) over the lists containing the
        node). This is the fourth query mode the reference lacks — its
        exact and semantic modes (pkg/tools/query.go:32-41) run as
        separate probes with a client-side merge (reader.go:110-118);
        here both rankings and the fusion are one declarative plan per
        side, truncated to ``k_each`` before ranks are assigned (so no
        global-rank shuffle, see operators/retrieval.py).

        Returns nodes sorted by fused score; each carries ``rrf`` plus
        its keyword/semantic ranks (None where absent from that list).
        """
        from mie_spark.operators.retrieval import (
            bm25_scores,
            rank_topk,
            rrf_fuse,
        )

        terms = [t for t in query.lower().split() if t]
        if not terms:
            return []
        per_type: list[DataFrame] = []
        for table in self._tables_for(node_types):
            nodes = self.store.table(table)
            if table == "mie_fact" and valid_only:
                nodes = nodes.filter(F.col("valid"))
            cols = _SEARCH_COLS[table]
            per_type.append(
                nodes.select(
                    F.col("id").alias("node_id"),
                    F.concat_ws(" ", *[F.col(c) for c in cols]).alias(
                        "text"
                    ),
                )
            )
        if not per_type:
            return []
        corpus = per_type[0]
        for df in per_type[1:]:
            corpus = corpus.unionByName(df)
        kw_scores = bm25_scores(corpus, terms, id_col="node_id")
        kw = rank_topk(kw_scores, "score_u", "node_id", k_each)

        sem_ranking = self._semantic_ranking(query, node_types, valid_only)
        fused_rankings = [kw]
        rank_cols = ["rank_kw"]
        if sem_ranking is not None:
            sem = rank_topk(sem_ranking, "similarity", "node_id", k_each)
            fused_rankings.append(sem)
            rank_cols.append("rank_sem")
        fused = rrf_fuse(fused_rankings, "node_id", rank_cols, k=rrf_k)
        top = fused.limit(limit).collect()
        nodes = self._fetch_nodes_by_ids([r["node_id"] for r in top])
        results = []
        for r in top:
            results.append(
                {
                    **nodes.get(r["node_id"], {}),
                    "node_type": ids.node_type_of(r["node_id"]),
                    "rrf": float(r["rrf"]),
                    "rank_kw": r["rank_kw"],
                    "rank_sem": r["rank_sem"] if sem_ranking is not None else None,
                }
            )
        return results

    def find_entity_by_name(self, name: str) -> dict[str, Any] | None:
        """Case-insensitive first match (reader.go:384-393)."""
        rows = (
            self.store.table("mie_entity")
            .filter(F.lower(F.col("name")) == name.lower())
            .orderBy("id")
            .limit(1)
            .collect()
        )
        return rows[0].asDict() if rows else None

    def find_fact_by_content(self, content: str) -> dict[str, Any] | None:
        rows = (
            self.store.table("mie_fact")
            .filter(F.col("content") == content)
            .orderBy("id")
            .limit(1)
            .collect()
        )
        return rows[0].asDict() if rows else None

    def find_decision_by_title(self, title: str) -> dict[str, Any] | None:
        """Substring first match on decision title (reader.go:438-462:
        `str_includes(title, ...)` + limit 1). Completes the reference's
        find-trio alongside find_entity_by_name / find_fact_by_content;
        orderBy(id) makes the limit-1 pick deterministic where Cozo's
        unordered `:limit 1` is not."""
        rows = (
            self.store.table("mie_decision")
            .filter(F.col("title").contains(title))
            .orderBy("id")
            .limit(1)
            .collect()
        )
        return rows[0].asDict() if rows else None

    def list_nodes(
        self,
        node_type: str,
        category: str | None = None,
        kind: str | None = None,
        status: str | None = None,
        valid_only: bool = False,
        limit: int = 100,
        offset: int = 0,
    ) -> tuple[list[dict[str, Any]], int]:
        """Filtered scan + order + pagination + total (tools/list.go).
        Limit clamped to 100 like the tool layer (list.go:28-35)."""
        limit = max(1, min(limit, 100))
        table = self._resolve_type(node_type)
        df = self.store.table(table)
        if category and table == "mie_fact":
            df = df.filter(F.col("category") == category)
        if kind and table == "mie_entity":
            df = df.filter(F.col("kind") == kind)
        if status and table == "mie_decision":
            df = df.filter(F.col("status") == status)
        if valid_only and table == "mie_fact":
            df = df.filter(F.col("valid"))
        total = df.count()
        rows = (
            df.orderBy(F.col("created_at").desc(), F.col("id"))
            .offset(offset)
            .limit(limit)
            .collect()
        )
        return [r.asDict() for r in rows], total

    def get_stats(self) -> dict[str, int]:
        """Node/edge census (reader.go:616-665). Facts sweep in ONE
        conditional-aggregate pass instead of the reference's 8 counts."""
        stats: dict[str, int] = {}
        fact_agg = (
            self.store.table("mie_fact")
            .agg(
                F.count(F.lit(1)).alias("total"),
                F.sum(F.when(F.col("valid"), 1).otherwise(0)).alias("valid"),
            )
            .collect()[0]
        )
        stats["facts"] = fact_agg["total"] or 0
        stats["valid_facts"] = int(fact_agg["valid"] or 0)
        stats["invalid_facts"] = stats["facts"] - stats["valid_facts"]
        dec_agg = (
            self.store.table("mie_decision")
            .agg(
                F.count(F.lit(1)).alias("total"),
                F.sum(F.when(F.col("status") == "active", 1).otherwise(0)).alias(
                    "active"
                ),
            )
            .collect()[0]
        )
        stats["decisions"] = dec_agg["total"] or 0
        stats["active_decisions"] = int(dec_agg["active"] or 0)
        for table, key in (
            ("mie_entity", "entities"),
            ("mie_event", "events"),
            ("mie_topic", "topics"),
        ):
            stats[key] = self.store.table(table).count()
        stats["relationships"] = sum(
            self.store.table(t).count() for t in EDGE_TABLES
        )
        return stats

    # ------------------------------------------------------------------
    # graph traversals (reader.go:463-614) — J1-J4, J6
    # ------------------------------------------------------------------

    def _traverse(
        self, edge_table: str, filter_col: str, node_table: str, join_col: str,
        node_id: str, extra_cols: list[str] | None = None,
    ) -> list[dict[str, Any]]:
        edges = self.store.table(edge_table).filter(
            F.col(filter_col) == F.lit(node_id)
        )
        nodes = self.store.table(node_table)
        joined = F.broadcast(edges).join(
            nodes, edges[join_col] == nodes["id"]
        )
        cols = [nodes[c.name] for c in NODE_TABLES[node_table]]
        cols += [edges[c] for c in (extra_cols or [])]
        return [r.asDict() for r in joined.select(*cols).collect()]

    def get_entities_for_fact(self, fact_id: str) -> list[dict[str, Any]]:
        return self._traverse(
            "mie_fact_entity", "fact_id", "mie_entity", "entity_id", fact_id
        )

    def get_facts_for_entity(self, entity_id: str) -> list[dict[str, Any]]:
        return self._traverse(
            "mie_fact_entity", "entity_id", "mie_fact", "fact_id", entity_id
        )

    def get_entities_for_decision(self, decision_id: str) -> list[dict[str, Any]]:
        """Traversal carrying the edge's own `role` attribute (J3)."""
        return self._traverse(
            "mie_decision_entity",
            "decision_id",
            "mie_entity",
            "entity_id",
            decision_id,
            extra_cols=["role"],
        )

    def get_decisions_for_entity(self, entity_id: str) -> list[dict[str, Any]]:
        return self._traverse(
            "mie_decision_entity", "entity_id", "mie_decision", "decision_id", entity_id
        )

    def get_topics_for_fact(self, fact_id: str) -> list[dict[str, Any]]:
        return self._traverse(
            "mie_fact_topic", "fact_id", "mie_topic", "topic_id", fact_id
        )

    def get_invalidation_chain(self, fact_id: str) -> list[dict[str, Any]]:
        """Both-direction chain (reader.go:547-583). The reference needs
        a two-rule Datalog union because or() can't wrap `=`; one OR
        filter + two aliased joins replaces it (J6)."""
        edges = self.store.table("mie_invalidates").filter(
            (F.col("new_fact_id") == fact_id) | (F.col("old_fact_id") == fact_id)
        )
        facts = self.store.table("mie_fact")
        old_f = facts.alias("old_f")
        new_f = facts.alias("new_f")
        joined = (
            edges.join(old_f, edges["old_fact_id"] == F.col("old_f.id"))
            .join(new_f, edges["new_fact_id"] == F.col("new_f.id"))
            .select(
                edges["new_fact_id"],
                edges["old_fact_id"],
                edges["reason"],
                F.col("old_f.content").alias("old_content"),
                F.col("new_f.content").alias("new_content"),
            )
        )
        return [r.asDict() for r in joined.collect()]

    # ------------------------------------------------------------------
    # conflicts (conflicts.go) — V3/V4, vectorized
    # ------------------------------------------------------------------

    def detect_conflicts(
        self, threshold: float = 0.85, limit: int = 50
    ) -> list[dict[str, Any]]:
        """Pairwise similarity over *valid* facts via the bucketed
        ``similarity_self_join`` operator (canonical a<b ordering) —
        replaces the reference's O(n) sequential embed+probe loop
        (conflicts.go:73-154) with the same sub-quadratic plan the
        dedup family uses (broadcast-BLAS under the size cap, banded
        hyperplane LSH above it — never a crossJoin). threshold is
        minimum similarity (quirk fix, SURVEY §2.10)."""
        from mie_spark.operators.vector import similarity_self_join

        emb = self.store.table("mie_fact_embedding")
        valid = self.store.table("mie_fact").filter(F.col("valid"))
        # the self-join probes this view several times (dim probe, size
        # check, matrix collect) and the content joins read it twice
        # more — persist so the embedding⋈fact join executes once
        ve = (
            emb.join(valid, emb["fact_id"] == valid["id"])
            .select("fact_id", "embedding", "content")
            .persist()
        )
        try:
            sims = similarity_self_join(
                ve, "embedding", threshold, id_col="fact_id"
            ).withColumnRenamed("sim", "similarity")
            content = ve.select("fact_id", "content")
            pairs = (
                sims.join(
                    content.select(
                        F.col("fact_id").alias("a_id"),
                        F.col("content").alias("a_content"),
                    ),
                    "a_id",
                )
                .join(
                    content.select(
                        F.col("fact_id").alias("b_id"),
                        F.col("content").alias("b_content"),
                    ),
                    "b_id",
                )
                .orderBy(F.col("similarity").desc(), F.col("a_id"), F.col("b_id"))
                .limit(limit)
                .select("a_id", "b_id", "a_content", "b_content", "similarity")
            )
            return [r.asDict() for r in pairs.collect()]
        finally:
            ve.unpersist()

    def check_conflicts_for_content(
        self,
        content: str,
        category: str | None = None,
        threshold: float = 0.85,
        k: int = 10,
    ) -> list[dict[str, Any]]:
        """New-content probe before store (conflicts.go:172-241)."""
        qvec = self.embedder.embed_query(content)
        q = F.array(*[F.lit(float(x)) for x in qvec])
        emb = self.store.table("mie_fact_embedding")
        facts = self.store.table("mie_fact").filter(F.col("valid"))
        if category:
            facts = facts.filter(F.col("category") == category)
        joined = (
            emb.join(facts, emb["fact_id"] == facts["id"])
            .withColumn("similarity", cosine_sim(F.col("embedding"), q))
            .filter(F.col("similarity") >= threshold)
            .orderBy(F.col("similarity").desc(), F.col("fact_id"))
            .limit(k)
            .select("fact_id", "content", "category", "similarity")
        )
        return [r.asDict() for r in joined.collect()]

    # ------------------------------------------------------------------
    # export / import / raw query / usage (S5-S7, A5)
    # ------------------------------------------------------------------

    def export_json(self) -> dict[str, list[dict[str, Any]]]:
        """Full-graph JSON export (reader.go:707-764)."""
        out: dict[str, list[dict[str, Any]]] = {}
        for table in list(NODE_TABLES) + list(EDGE_TABLES):
            out[table] = [r.asDict() for r in self.store.table(table).collect()]
        return out

    def export_graph(
        self,
        node_types: list[str] | None = None,
        include_embeddings: bool = False,
    ) -> dict[str, Any]:
        """`ExportGraph` parity (client.go:245-247, reader.go:707-779;
        ExportOptions/ExportData shapes at tools/client.go:240-257):
        a VERSIONED export of the selected node types with per-type
        stats — empty/None node_types means all five, unknown names
        are ignored exactly like the reference's switch. Edges ride
        along under 'relationships' (the ExportData field the
        reference populates from the edge tables), filtered to those
        whose endpoint types were both selected; include_embeddings
        adds each selected type's embedding table. export_json stays
        the flat everything-dump the CLI round-trips."""
        # exact ExportData JSON field names (tools/client.go:251-255);
        # ExportedAt serializes as an RFC3339 UTC string in the
        # reference (reader.go:710), not unix seconds — derive it from
        # the same now_s() clock so tests can freeze time one place.
        import datetime as _dt

        exported_at = (
            _dt.datetime.fromtimestamp(now_s(), tz=_dt.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ")
        )
        plural = {
            "fact": "facts",
            "decision": "decisions",
            "entity": "entities",
            "event": "events",
            "topic": "topics",
        }
        chosen = [t for t in (node_types or list(plural)) if t in plural]
        out: dict[str, Any] = {
            "version": "1",
            "exported_at": exported_at,
            "stats": {},
        }
        for nt in chosen:
            rows = [
                r.asDict() for r in self.store.table(f"mie_{nt}").collect()
            ]
            out[plural[nt]] = rows
            out["stats"][plural[nt]] = len(rows)
        prefixes = {
            "mie_invalidates": ("fact", "fact"),
            "mie_decision_topic": ("decision", "topic"),
            "mie_decision_entity": ("decision", "entity"),
            "mie_event_decision": ("event", "decision"),
            "mie_fact_entity": ("fact", "entity"),
            "mie_fact_topic": ("fact", "topic"),
            "mie_entity_topic": ("entity", "topic"),
        }
        rels: dict[str, list[dict[str, Any]]] = {}
        for table, (a, b) in prefixes.items():
            if a in chosen and b in chosen:
                rels[table] = [
                    r.asDict() for r in self.store.table(table).collect()
                ]
        if rels:
            out["relationships"] = rels
        if include_embeddings:
            emb: dict[str, list[dict[str, Any]]] = {}
            for table, key in EMBEDDING_TABLES.items():
                nt = key.removesuffix("_id")
                if nt in chosen:
                    emb[table] = [
                        r.asDict() for r in self.store.table(table).collect()
                    ]
            out["embeddings"] = emb
        return out

    # Reference-named aliases for drop-in parity — the reference exposes
    # the same traversals under these names (GetRelatedEntities
    # reader.go:464; GetRelatedFacts reader.go:586, itself an alias of
    # GetFactsAboutEntity; IncrementCounter client.go:250-292, which our
    # store implements atomically).
    def get_related_entities(self, fact_id: str) -> list[dict[str, Any]]:
        return self.get_entities_for_fact(fact_id)

    def get_related_facts(self, entity_id: str) -> list[dict[str, Any]]:
        return self.get_facts_for_entity(entity_id)

    def increment_counter(self, key: str) -> int:
        return self.store.meta_increment(key)

    def import_json(self, data: dict[str, list[dict[str, Any]]]) -> int:
        """Re-store imported nodes: IDs re-derive from content and
        embeddings regenerate, exactly like the reference import
        (cmd/mie/import.go:116-207). Provenance fields (source_agent /
        source_conversation) survive the round trip, and facts exported
        with valid=False are re-flagged after the re-store — the
        mie_invalidates edges import verbatim, so leaving the flag True
        would desync the graph from its own invalidation edges."""
        n = 0
        invalid_ids: list[str] = []
        for row in data.get("mie_fact", []):
            fid = self.store_fact(
                row["content"],
                row.get("category"),
                row.get("confidence"),
                row.get("source_agent", ""),
                row.get("source_conversation", ""),
            )
            if row.get("valid") is False:
                invalid_ids.append(fid)
            n += 1
        for row in data.get("mie_decision", []):
            self.store_decision(
                row["title"],
                row["rationale"],
                row.get("alternatives", "[]"),
                row.get("context", ""),
                row.get("status", "active"),
                row.get("source_agent", ""),
                row.get("source_conversation", ""),
            )
            n += 1
        for row in data.get("mie_entity", []):
            self.store_entity(
                row["name"],
                row["kind"],
                row.get("description", ""),
                row.get("source_agent", ""),
            )
            n += 1
        for row in data.get("mie_event", []):
            self.store_event(
                row["title"],
                row.get("description", ""),
                row.get("event_date", ""),
                row.get("source_agent", ""),
                row.get("source_conversation", ""),
            )
            n += 1
        for row in data.get("mie_topic", []):
            self.store_topic(row["name"], row.get("description", ""))
            n += 1
        if invalid_ids:
            rows = [
                dict(node, valid=False)
                for fid in invalid_ids
                if (node := self.get_node_by_id(fid)) is not None
            ]
            self.store.upsert_rows("mie_fact", rows)
        for table in EDGE_TABLES:
            rows = data.get(table, [])
            if rows:
                self.store.upsert_rows(table, rows)
                n += len(rows)
        return n

    def export_sql_script(self) -> str:
        """Rows rendered as replayable INSERT statements — the Spark
        analog of the reference's Datalog-script export
        (pkg/tools/export.go:59-115)."""
        lines: list[str] = []
        for table in list(NODE_TABLES) + list(EDGE_TABLES):
            for row in self.store.table(table).collect():
                d = row.asDict()
                cols = ", ".join(d.keys())
                vals = ", ".join(_sql_literal(v) for v in d.values())
                lines.append(f"INSERT INTO {table} ({cols}) VALUES ({vals});")
        return "\n".join(lines)

    def import_sql_script(
        self,
        script: str,
        dry_run: bool = False,
        regenerate_embeddings: bool = True,
    ) -> int:
        """Replay a script produced by ``export_sql_script`` — the S6
        import half (cmd/mie/import.go:209-227: the reference replays
        its exported Datalog through RawQuery; here the INSERTs replay
        through the store's idempotent upsert, so importing the same
        script twice is a no-op). Statements are split quote-aware
        (content strings may contain ``;``, ``,``, newlines, escaped
        quotes). Returns the number of rows parsed; ``dry_run`` parses
        and validates without writing (import.go's --dry-run).

        ``regenerate_embeddings`` (default on) re-embeds imported nodes
        so semantic search and conflict detection see them immediately —
        scripts carry no vectors. The reference's raw replay skips this
        (imported facts stay invisible to vector search until its async
        embedder is poked); pass False for byte-faithful parity."""
        import re

        stmt_re = re.compile(
            r"INSERT INTO (\w+)\s*\(([^)]*)\)\s*VALUES\s*\((.*)\)$", re.DOTALL
        )
        known = set(NODE_TABLES) | set(EDGE_TABLES)
        batches: dict[str, list[dict[str, Any]]] = {}
        n = 0
        for stmt in _split_sql_statements(script):
            m = stmt_re.match(stmt)
            if not m:
                raise ValueError(f"unsupported statement: {stmt[:80]!r}")
            table = m.group(1)
            if table not in known:
                raise ValueError(f"unknown table in script: {table!r}")
            cols = [c.strip() for c in m.group(2).split(",")]
            vals = _parse_sql_row(m.group(3))
            if len(cols) != len(vals):
                raise ValueError(
                    f"column/value arity mismatch in: {stmt[:80]!r}"
                )
            batches.setdefault(table, []).append(dict(zip(cols, vals)))
            n += 1
        if dry_run:
            return n
        for table, rows in batches.items():  # script order: nodes first
            self.store.upsert_rows(table, rows)
            if regenerate_embeddings and table in _EMBED_SOURCE:
                emb_table, id_col = _EMBED_SOURCE[table]
                texts = [_EMBED_TEXT[table](r) for r in rows]
                vecs = self.embedder.embed(texts)
                self.store.upsert_rows(
                    emb_table,
                    [
                        {id_col: r["id"], "embedding": v}
                        for r, v in zip(rows, vecs)
                    ],
                )
        return n

    def raw_query(self, sql: str) -> DataFrame:
        """The raw escape hatch: reference exposes CozoScript
        (cmd/mie/query.go:22-123); here it is the whole Spark SQL
        surface over the registered graph tables."""
        for table in list(NODE_TABLES) + list(EDGE_TABLES) + list(EMBEDDING_TABLES):
            self.store.table(table).createOrReplaceTempView(table)
        self.store.table("mie_meta").createOrReplaceTempView("mie_meta")
        return self.spark.sql(sql)

    def record_query(self) -> None:
        self.store.meta_touch("total_queries", "last_query_at", str(now_s()))

    def record_store(self) -> None:
        self.store.meta_touch("total_stores", "last_store_at", str(now_s()))

    def get_usage(self) -> dict[str, Any]:
        g = self.store.meta_get
        return {
            "total_queries": int(g("total_queries") or 0),
            "total_stores": int(g("total_stores") or 0),
            "last_query_at": g("last_query_at"),
            "last_store_at": g("last_store_at"),
            "schema_version": g("schema_version"),
        }

    def reset(self) -> None:
        self.store.reset()

    def backup(self, dest: str) -> dict[str, str]:
        """Point-in-time copy of every table (cozodb.go:174-201 Backup),
        written as plain parquet under ``dest``."""
        return self.store.backup(dest)

    def restore(self, src: str) -> dict[str, str]:
        """Replace store state with a backup's (cozodb.go:203-232)."""
        return self.store.restore(src)

    # ------------------------------------------------------------------

    def _resolve_type(self, node_type: str) -> str:
        table = _TYPE_ALIASES.get(node_type, node_type)
        if table not in NODE_TABLES:
            raise ValueError(f"unknown node type {node_type!r}")
        return table

    def _tables_for(self, node_types: list[str] | None) -> list[str]:
        if not node_types:
            return list(NODE_TABLES)
        return [self._resolve_type(t) for t in node_types]


def _sql_literal(value: Any) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return str(value)
    escaped = str(value).replace("'", "''")
    return f"'{escaped}'"


def _split_sql_statements(script: str) -> list[str]:
    """Split on ``;`` outside string literals ('' is the escape)."""
    out: list[str] = []
    buf: list[str] = []
    in_str = False
    i = 0
    while i < len(script):
        ch = script[i]
        if in_str:
            buf.append(ch)
            if ch == "'":
                if i + 1 < len(script) and script[i + 1] == "'":
                    buf.append("'")
                    i += 2
                    continue
                in_str = False
            i += 1
            continue
        if ch == "'":
            in_str = True
            buf.append(ch)
            i += 1
            continue
        if ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                out.append(stmt)
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


def _parse_sql_row(values: str) -> list[Any]:
    """Parse one VALUES(...) body back into python values — the exact
    inverse of _sql_literal (strings with '' escapes, ints, floats,
    TRUE/FALSE/NULL)."""
    import re

    vals: list[Any] = []
    i, n = 0, len(values)
    while i < n:
        while i < n and values[i] in " ,\n\t":
            i += 1
        if i >= n:
            break
        if values[i] == "'":
            i += 1
            buf: list[str] = []
            while i < n:
                if values[i] == "'":
                    if i + 1 < n and values[i + 1] == "'":
                        buf.append("'")
                        i += 2
                        continue
                    i += 1
                    break
                buf.append(values[i])
                i += 1
            vals.append("".join(buf))
        else:
            j = i
            while j < n and values[j] != ",":
                j += 1
            tok = values[i:j].strip()
            i = j
            up = tok.upper()
            if up == "NULL":
                vals.append(None)
            elif up == "TRUE":
                vals.append(True)
            elif up == "FALSE":
                vals.append(False)
            elif re.fullmatch(r"-?\d+", tok):
                vals.append(int(tok))
            else:
                vals.append(float(tok))
    return vals

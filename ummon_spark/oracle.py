"""DuckDB oracle SQL mirroring every pipeline stage.

The driver's correctness gate runs each Spark query side-by-side with an
ANSI-SQL equivalent on the same parquet (CORRECTNESS_r{N}.json). The KG
pipeline's input derivation (corpus.spanify) is deliberately
SQL-expressible, so the ENTIRE pipeline — spanify → mentions → nodes →
edges → graph queries — has an exact DuckDB oracle, built here as one
reusable WITH-chain. Any semantic drift between ummon_spark and these
CTEs fails the gate.

Keep in lockstep with: corpus.spanify, operators/parse.py,
operators/nodes.py, operators/edges.py, operators/traversal.py.
"""

from __future__ import annotations

# --- spanify (corpus.spanify) ---------------------------------------------
SPANS_CTES = """
toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS toks
  FROM documents
),
idx AS (
  SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM toks
),
spans AS (
  SELECT doc_id,
         CAST(i - 1 AS BIGINT) AS span_idx,
         CASE (i - 1) % 11 WHEN 0 THEN 'def' WHEN 2 THEN 'call' WHEN 4 THEN 'class'
              WHEN 6 THEN 'import' WHEN 8 THEN 'image' ELSE 'text' END AS kind,
         CASE
           WHEN (i - 1) % 11 IN (0, 4)
             THEN concat(toks[i], '(', coalesce(toks[i + 1], ''), ')')
           WHEN (i - 1) % 22 = 13 THEN concat(coalesce(toks[i - 1], ''), '.', toks[i])
           WHEN (i - 1) % 11 = 2 THEN toks[i]
           WHEN (i - 1) % 11 = 6 THEN concat('lib.', toks[i])
           WHEN (i - 1) % 11 = 8 THEN ''
           ELSE toks[i]
         END AS text,
         CASE WHEN (i - 1) % 11 = 8 THEN concat('img_', toks[i]) ELSE '' END AS media_ref,
         CAST(i - 1 AS BIGINT) AS "offset"
  FROM idx
)"""

# --- parse stage (operators/parse.py) -------------------------------------
MENTIONS_CTES = SPANS_CTES + """,
mentions AS (
  SELECT doc_id, span_idx,
    CASE kind WHEN 'def' THEN 'Function' WHEN 'class' THEN 'Class'
         WHEN 'call' THEN 'CallSite' WHEN 'import' THEN 'Import'
         WHEN 'image' THEN 'Media' END AS mention_type,
    CASE kind
      WHEN 'def' THEN split_part(text, '(', 1)
      WHEN 'class' THEN split_part(text, '(', 1)
      WHEN 'call' THEN CASE WHEN contains(text, '.') THEN string_split(text, '.')[-1] ELSE text END
      WHEN 'import' THEN text
      WHEN 'image' THEN media_ref END AS name,
    CASE kind
      WHEN 'def' THEN split_part(split_part(text, '(', 2), ')', 1)
      WHEN 'class' THEN split_part(split_part(text, '(', 2), ')', 1)
      WHEN 'call' THEN CASE WHEN contains(text, '.') THEN text ELSE '' END
      WHEN 'image' THEN media_ref ELSE '' END AS detail,
    media_ref, "offset"
  FROM spans WHERE kind IN ('def', 'class', 'call', 'import', 'image')
)"""

# --- node build (operators/nodes.py) --------------------------------------
NODES_CTES = MENTIONS_CTES + """,
node_cands AS (
  SELECT concat(doc_id, '::', name) AS id, name, 'Function' AS entity_type, doc_id,
         doc_id AS containing_entity, detail, doc_id AS ord_doc, span_idx AS ord_idx
  FROM mentions WHERE mention_type = 'Function'
  UNION ALL
  SELECT concat('type::', doc_id, '::', name), name, 'Class', doc_id, doc_id,
         detail, doc_id, span_idx
  FROM mentions WHERE mention_type = 'Class'
  UNION ALL
  SELECT concat('media::', name), name, 'Media', doc_id, '', media_ref,
         doc_id, span_idx
  FROM mentions WHERE mention_type = 'Media'
  UNION ALL
  SELECT DISTINCT doc_id, doc_id, 'Module', doc_id, '', '', doc_id,
         CAST(-1 AS BIGINT)
  FROM toks
),
nodes AS (
  SELECT id, name, entity_type, doc_id, containing_entity, detail,
         ord_idx AS loc_off
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY id ORDER BY ord_doc DESC, ord_idx DESC) AS rn
    FROM node_cands) WHERE rn = 1
)"""

# --- edge build (operators/edges.py) --------------------------------------
# mctx mirrors edges.member_context: the most recent preceding class
# mention name per mention row (dialect class->member containment)
EDGES_CTES = NODES_CTES + """,
mctx AS (
  SELECT doc_id, span_idx, mention_type, name,
         last_value(CASE WHEN mention_type = 'Class' THEN name END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY span_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_cls
  FROM mentions
),
edge_cands AS (
  SELECT doc_id AS subj, 'defines' AS pred, concat(doc_id, '::', name) AS obj,
         doc_id, span_idx
  FROM mentions WHERE mention_type = 'Function'
  UNION ALL
  SELECT concat('type::', doc_id, '::', last_cls), 'contains',
         concat(doc_id, '::', name), doc_id, span_idx
  FROM mctx WHERE mention_type = 'Function' AND last_cls IS NOT NULL
  UNION ALL
  SELECT doc_id, 'defines', concat('type::', doc_id, '::', name), doc_id, span_idx
  FROM mentions WHERE mention_type = 'Class'
  UNION ALL
  SELECT concat(doc_id, '::', name), 'calls', detail, doc_id, span_idx
  FROM mentions WHERE mention_type = 'CallSite' AND detail <> ''
  UNION ALL
  SELECT doc_id, 'references', name, doc_id, span_idx
  FROM mentions WHERE mention_type = 'CallSite' AND detail = ''
  UNION ALL
  SELECT doc_id, 'imports', name, doc_id, span_idx
  FROM mentions WHERE mention_type = 'Import'
  UNION ALL
  SELECT concat(doc_id, '::', name), 'inherits', detail, doc_id, span_idx
  FROM mentions WHERE mention_type = 'Class' AND detail <> ''
  UNION ALL
  SELECT doc_id, 'depicts', concat('media::', name), doc_id, span_idx
  FROM mentions WHERE mention_type = 'Media'
),
edges AS (
  SELECT concat(subj, '->', obj, '::', pred) AS id, subj, pred, obj
  FROM (
    SELECT c.*, row_number() OVER (
      PARTITION BY concat(c.subj, '->', c.obj, '::', c.pred)
      ORDER BY c.doc_id, c.span_idx) AS rn
    FROM edge_cands c
    WHERE EXISTS (SELECT 1 FROM nodes n WHERE n.id = c.subj)
  ) WHERE rn = 1
)"""

# --- placeholder synthesis + full node set --------------------------------
GRAPH_CTES = EDGES_CTES + """,
placeholders AS (
  SELECT DISTINCT e.obj AS id FROM edges e
  WHERE NOT EXISTS (SELECT 1 FROM nodes n WHERE n.id = e.obj)
),
all_nodes AS (
  SELECT id, name, entity_type, doc_id, containing_entity FROM nodes
  UNION ALL
  -- placeholder name = last '::' segment of the id, matching
  -- nodes.synthesize_placeholders (substring_index(id, '::', -1)) and
  -- the reference's split("::").last()
  SELECT id, string_split(id, '::')[-1] AS name, 'Function', '', '' FROM placeholders
)"""


# --- linking + canonicalization (operators/linking.py + cc.py) ------------
# The Spark side computes components with large-star/small-star; the
# star-shaped same-as pairs make each component exactly one key group,
# so the oracle is a window min over the key partition.
CANON_CTES = GRAPH_CTES + """,
link_keys AS (
  SELECT id,
         string_split(regexp_replace(lower(name), '^(img_|aud_|vid_)', ''), '.')[-1] AS key
  FROM all_nodes
  WHERE (entity_type = 'Function' AND doc_id = '') OR entity_type = 'Media'
),
canon AS (
  SELECT id, MIN(id) OVER (PARTITION BY key) AS canonical_id FROM link_keys
),
canon_edges AS (
  SELECT concat(subj, '->', obj, '::', pred) AS id, subj, pred, obj,
         CAST(w AS DOUBLE) AS weight
  FROM (
    SELECT coalesce(cs.canonical_id, e.subj) AS subj, e.pred,
           coalesce(co.canonical_id, e.obj) AS obj, SUM(1.0) AS w
    FROM edges e
    LEFT JOIN canon cs ON cs.id = e.subj
    LEFT JOIN canon co ON co.id = e.obj
    GROUP BY 1, 2, 3
  )
)"""


def q(ctes: str, body: str) -> str:
    return f"WITH {ctes}\n{body}"

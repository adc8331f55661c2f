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
# m = 0-based token index % 23; cyc = index // 23 (cycle alternation);
# tok/nxt/nx2/nx3/prv are toks[i]/[i+1]/[i+2]/[i+3]/[i-1] coalesced ''.
SPANS_CTES = """
toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS toks
  FROM documents
),
idx AS (
  SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM toks
),
sidx AS (
  SELECT doc_id,
         CAST(i - 1 AS BIGINT) AS i0,
         (i - 1) % 23 AS m,
         ((i - 1) // 23) % 2 = 1 AS cyc_odd,
         ((i - 1) // 23) % 3 AS mod3,
         toks[i] AS tok,
         coalesce(toks[i + 1], '') AS nxt,
         coalesce(toks[i + 2], '') AS nx2,
         coalesce(toks[i + 3], '') AS nx3,
         coalesce(toks[i - 1], '') AS prv
  FROM idx
),
spans AS (
  SELECT doc_id,
         i0 AS span_idx,
         CASE m WHEN 0 THEN 'def' WHEN 2 THEN 'call' WHEN 4 THEN 'class'
              WHEN 6 THEN 'import' WHEN 8 THEN 'image'
              WHEN 10 THEN 'interface' WHEN 12 THEN 'trait'
              WHEN 14 THEN 'enum' WHEN 16 THEN 'struct'
              WHEN 18 THEN 'var' WHEN 19 THEN 'const' WHEN 20 THEN 'doc'
              WHEN 21 THEN (CASE WHEN cyc_odd THEN 'video' ELSE 'audio' END)
              WHEN 22 THEN 'def'
              ELSE 'text' END AS kind,
         CASE
           WHEN m = 0 THEN concat(tok, '(',
                CASE WHEN cyc_odd THEN concat(nxt, ':', nx2, '=', nx3)
                     ELSE nxt END, ')')
           WHEN m = 2 THEN (CASE WHEN cyc_odd THEN concat(prv, '.', tok) ELSE tok END)
           WHEN m = 4 THEN concat(tok, '(',
                CASE WHEN cyc_odd THEN concat(nxt, ',', nx2) ELSE nxt END, ')')
           WHEN m = 6 THEN concat('lib.', tok)
           WHEN m = 10 THEN concat(tok,
                CASE WHEN cyc_odd THEN concat('<', nx2, '>') ELSE '' END,
                '(', nxt, ')')
           WHEN m = 12 THEN concat(tok,
                CASE WHEN cyc_odd THEN concat('<', nx2, '=', nx3, '>')
                     ELSE '' END,
                '(', nxt, ')')
           WHEN m IN (14, 16) THEN concat(tok,
                CASE WHEN cyc_odd THEN concat('<', nx2, ':', nx3, '>')
                     ELSE '' END,
                '(', nxt, ')')
           WHEN m = 18 THEN concat(tok, ':', nxt, '=', nx2)
           WHEN m = 19 THEN concat(tok, '=', nxt)
           WHEN m = 20 THEN concat(tok, ' ', nxt)
           WHEN m IN (8, 21) THEN ''
           WHEN m = 22 THEN concat(
                CASE mod3 WHEN 0 THEN 'async' WHEN 1 THEN 'static'
                     ELSE 'abstract' END,
                ' ', tok, '(', nxt, ')->', nx2)
           ELSE tok
         END AS text,
         CASE WHEN m = 8 THEN concat('img_', tok)
              WHEN m = 21 THEN concat(CASE WHEN cyc_odd THEN 'vid_' ELSE 'aud_' END, tok)
              ELSE '' END AS media_ref,
         i0 AS "offset"
  FROM sidx
)"""

# --- parse stage (operators/parse.py) -------------------------------------
_PAREN_KINDS = "('def', 'class', 'interface', 'trait', 'enum', 'struct')"
MENTIONS_CTES = SPANS_CTES + f""",
mentions AS (
  SELECT doc_id, span_idx,
    CASE kind WHEN 'def' THEN 'Function' WHEN 'class' THEN 'Class'
         WHEN 'interface' THEN 'Interface' WHEN 'trait' THEN 'Trait'
         WHEN 'enum' THEN 'Enum' WHEN 'struct' THEN 'Struct'
         WHEN 'var' THEN 'Variable' WHEN 'const' THEN 'Constant'
         WHEN 'call' THEN 'CallSite' WHEN 'import' THEN 'Import'
         WHEN 'doc' THEN 'Doc' ELSE 'Media' END AS mention_type,
    CASE
      WHEN kind IN {_PAREN_KINDS}
        THEN split_part(split_part(
               regexp_replace(text, '^(async|static|abstract) ', ''),
               '(', 1), '<', 1)
      WHEN kind = 'call' THEN CASE WHEN contains(text, '.') THEN string_split(text, '.')[-1] ELSE text END
      WHEN kind = 'import' THEN text
      WHEN kind IN ('var', 'const') THEN split_part(split_part(text, '=', 1), ':', 1)
      WHEN kind IN ('image', 'audio', 'video') THEN media_ref
      ELSE '' END AS name,
    CASE
      WHEN kind IN {_PAREN_KINDS}
        THEN coalesce(regexp_extract(text, '\\(([^)]*)\\)', 1), '')
      WHEN kind = 'call' THEN CASE WHEN contains(text, '.') THEN text ELSE '' END
      WHEN kind IN ('var', 'const') THEN regexp_replace(text, '^[^:=]*', '')
      WHEN kind IN ('image', 'audio', 'video') THEN media_ref
      WHEN kind = 'doc' THEN text
      ELSE '' END AS detail,
    media_ref, "offset",
    CASE WHEN kind = 'def'
         THEN coalesce(regexp_extract(text, '^(async|static|abstract) ', 1), '')
         ELSE '' END AS modifier,
    CASE WHEN kind = 'def'
         THEN coalesce(regexp_extract(text, '\\)->(.*)$', 1), '')
         ELSE '' END AS ret,
    CASE WHEN kind IN ('class', 'interface', 'trait', 'enum', 'struct')
         THEN coalesce(regexp_extract(text, '<([^>]*)>', 1), '')
         ELSE '' END AS tparams
  FROM spans WHERE kind IN ('def', 'class', 'interface', 'trait', 'enum',
                            'struct', 'var', 'const', 'call', 'import',
                            'doc', 'image', 'audio', 'video')
)"""

# --- node build (operators/nodes.py) --------------------------------------
# Doc attachment (nodes.doc_attachments): each Doc mention attaches to
# the nearest FOLLOWING entity mention (first doc wins per target);
# trailing Docs attach to the module. node_cands mirrors build_nodes'
# single-pass id/type/containing synthesis; dedupe is last-wins by
# (ord_doc, ord_idx).
_ENTITY_MENTIONS_SQL = (
    "('Function','Class','Interface','Trait','Enum','Struct',"
    "'Variable','Constant')"
)
NODES_CTES = MENTIONS_CTES + f""",
docnext AS (
  SELECT doc_id, span_idx, mention_type, detail,
         min(CASE WHEN mention_type IN {_ENTITY_MENTIONS_SQL}
                  THEN span_idx END)
           OVER (PARTITION BY doc_id ORDER BY span_idx
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ent
  FROM mentions
),
entity_docs AS (
  SELECT doc_id, next_ent AS ent_idx, arg_min(detail, span_idx) AS edoc
  FROM docnext WHERE mention_type = 'Doc' AND next_ent IS NOT NULL
  GROUP BY doc_id, next_ent
),
module_docs AS (
  SELECT doc_id, arg_min(detail, span_idx) AS mdoc
  FROM docnext WHERE mention_type = 'Doc' AND next_ent IS NULL
  GROUP BY doc_id
),
node_cands AS (
  SELECT
    CASE mention_type
      WHEN 'Function' THEN concat(doc_id, '::', name)
      WHEN 'Variable' THEN concat(doc_id, '::var::', name)
      WHEN 'Constant' THEN concat(doc_id, '::const::', name)
      WHEN 'Media' THEN concat('media::', name)
      ELSE concat('type::', doc_id, '::', name) END AS id,
    name, mention_type AS entity_type, doc_id,
    CASE WHEN mention_type = 'Media' THEN '' ELSE doc_id END AS containing_entity,
    detail, modifier, ret, tparams, doc_id AS ord_doc, span_idx AS ord_idx
  FROM mentions
  WHERE mention_type IN ('Function','Class','Interface','Trait','Enum',
                         'Struct','Variable','Constant','Media')
  UNION ALL
  SELECT t.doc_id, t.doc_id, 'Module', t.doc_id, '', coalesce(md.mdoc, ''),
         '', '', '', t.doc_id, CAST(-1 AS BIGINT)
  FROM toks t LEFT JOIN module_docs md ON md.doc_id = t.doc_id
),
nodes AS (
  SELECT c.id, c.name, c.entity_type, c.doc_id, c.containing_entity,
         c.detail, c.modifier, c.ret, c.tparams, c.ord_idx AS loc_off,
         CASE WHEN c.entity_type = 'Module' THEN c.detail
              ELSE coalesce(ed.edoc, '') END AS documentation
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY id ORDER BY ord_doc DESC, ord_idx DESC) AS rn
    FROM node_cands) c
  LEFT JOIN entity_docs ed
    ON ed.doc_id = c.doc_id AND ed.ent_idx = c.ord_idx
  WHERE c.rn = 1
)"""

# --- edge build (operators/edges.py) --------------------------------------
# mctx mirrors edges.member_context: the most recent preceding
# class-LIKE mention name (any of the five type kinds) per member row
_TYPE_MENTIONS_SQL = "('Class','Interface','Trait','Enum','Struct')"
EDGES_CTES = NODES_CTES + f""",
mctx AS (
  SELECT doc_id, span_idx, mention_type, name,
         last_value(CASE WHEN mention_type IN {_TYPE_MENTIONS_SQL}
                         THEN name END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY span_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_cls
  FROM mentions
  WHERE mention_type IN ('Class','Interface','Trait','Enum','Struct',
                         'Function','Variable')
),
edge_cands AS (
  SELECT doc_id AS subj, 'defines' AS pred, concat(doc_id, '::', name) AS obj,
         doc_id, span_idx
  FROM mentions WHERE mention_type = 'Function'
  UNION ALL
  SELECT doc_id, 'defines', concat(doc_id, '::var::', name), doc_id, span_idx
  FROM mentions WHERE mention_type = 'Variable'
  UNION ALL
  SELECT doc_id, 'defines', concat(doc_id, '::const::', name), doc_id, span_idx
  FROM mentions WHERE mention_type = 'Constant'
  UNION ALL
  SELECT concat('type::', doc_id, '::', last_cls), 'contains',
         CASE WHEN mention_type = 'Function' THEN concat(doc_id, '::', name)
              ELSE concat(doc_id, '::var::', name) END,
         doc_id, span_idx
  FROM mctx WHERE mention_type IN ('Function', 'Variable')
    AND last_cls IS NOT NULL
  UNION ALL
  SELECT doc_id, 'defines', concat('type::', doc_id, '::', name), doc_id, span_idx
  FROM mentions WHERE mention_type IN {_TYPE_MENTIONS_SQL}
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
  SELECT concat(doc_id, '::', name),
         CASE WHEN mention_type IN ('Class', 'Struct') THEN 'inherits'
              ELSE 'implements' END,
         sup, doc_id, span_idx
  FROM (
    SELECT doc_id, span_idx, mention_type, name,
           unnest(string_split(detail, ',')) AS sup
    FROM mentions
    WHERE mention_type IN {_TYPE_MENTIONS_SQL} AND detail <> ''
  ) WHERE sup <> ''
  UNION ALL
  SELECT doc_id, 'depicts', concat('media::', name), doc_id, span_idx
  FROM mentions WHERE mention_type = 'Media'
),
edges AS (
  -- two-level dedupe, lockstep with edges.build_edges: first by the
  -- triple (first wins in (doc_id, span_idx) order), then by the
  -- recomputed id — the concat is not injective under adversarial
  -- names, and the reference DB collapses by id (relationship.rs:89-105)
  SELECT id, subj, pred, obj, src_doc, src_span
  FROM (
    SELECT t.*, row_number() OVER (
      PARTITION BY t.id
      ORDER BY t.src_doc, t.src_span, t.subj, t.pred, t.obj) AS rn2
    FROM (
      SELECT concat(subj, '->', obj, '::', pred) AS id, subj, pred, obj,
             doc_id AS src_doc, span_idx AS src_span
      FROM (
        SELECT c.*, row_number() OVER (
          PARTITION BY c.subj, c.pred, c.obj
          ORDER BY c.doc_id, c.span_idx) AS rn
        FROM edge_cands c
        WHERE EXISTS (SELECT 1 FROM nodes n WHERE n.id = c.subj)
      ) WHERE rn = 1
    ) t
  ) WHERE rn2 = 1
)"""

# --- placeholder synthesis + full node set --------------------------------
GRAPH_CTES = EDGES_CTES + """,
placeholders AS (
  SELECT DISTINCT e.obj AS id FROM edges e
  WHERE NOT EXISTS (SELECT 1 FROM nodes n WHERE n.id = e.obj)
),
all_nodes AS (
  SELECT id, name, entity_type, doc_id, containing_entity, documentation
  FROM nodes
  UNION ALL
  -- placeholder name = last '::' segment of the id, matching
  -- nodes.synthesize_placeholders (substring_index(id, '::', -1)) and
  -- the reference's split("::").last()
  SELECT id, string_split(id, '::')[-1] AS name, 'Function', '', '', ''
  FROM placeholders
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
  -- collapse-by-id after the triple merge, lockstep with
  -- linking.canonicalize_edges (first triple wins among colliding ids)
  SELECT id, subj, pred, obj, weight FROM (
    SELECT id, subj, pred, obj, weight, row_number() OVER (
      PARTITION BY id ORDER BY subj, pred, obj) AS rn
    FROM (
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
    )
  ) WHERE rn = 1
)"""


def q(ctes: str, body: str) -> str:
    return f"WITH {ctes}\n{body}"

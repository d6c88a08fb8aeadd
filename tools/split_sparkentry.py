#!/usr/bin/env python3
"""One-shot refactor: split SparkEntry.scala (9.3k lines) into per-family
registry files (queries + oracles co-located) + QueryHelpers, keeping
SparkEntry.queries/oracleSql as the assembled maps in the pinned bench
order. Run from repo root. Idempotence: not needed (one-shot, committed).
"""
import re, json, collections, os

SRC = 'src/main/scala/graft/SparkEntry.scala'
lines = open(SRC).read().split('\n')

def idx(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit('boundary not found')

obj_i    = idx(lambda l: l.startswith('object SparkEntry {'))
helpers_i = idx(lambda l: l.strip().startswith('/** Scratch space'))
qdoc_i   = idx(lambda l: l.strip().startswith('/** Insertion-ordered'))
qdef_i   = idx(lambda l: l.startswith('  def queries'))
# close of the queries ListMap: the bare "  )" line following the last entry
odef_i   = idx(lambda l: l.startswith('  def oracleSql'))
qclose_i = max(i for i in range(qdef_i, odef_i) if lines[i] == '  )')
dhash_i  = idx(lambda l: l.strip().startswith('/** DuckDB replay of textToBmp'), qclose_i)
oclose_i = max(i for i in range(odef_i, len(lines)) if lines[i] == '  )')

head_imports = lines[:obj_i]  # package + imports + file doc

entry_pat = re.compile(r'    "(q\d+[a-z_0-9]*)" ->')

def split_entries(block, attach_comments):
    """block: list of lines containing only map entries (and comments).
    Returns ordered list of (name, chunk_lines)."""
    starts = [i for i, l in enumerate(block) if entry_pat.match(l)]
    out = []
    bounds = starts + [len(block)]
    for k, s in enumerate(starts):
        e = bounds[k + 1]
        chunk = block[s:e]
        out.append([entry_pat.match(block[s]).group(1), chunk])
    if attach_comments:
        # move trailing 4-space comment lines of chunk k to chunk k+1 head
        for k in range(len(out) - 1):
            chunk = out[k][1]
            tail = []
            while chunk and chunk[-1].startswith('    //'):
                tail.insert(0, chunk.pop())
            out[k + 1][1] = tail + out[k + 1][1]
    return out

# queries entries live between the ListMap( line and qclose_i
listmap_i = idx(lambda l: 'ListMap(' in l, qdef_i)
q_entries = split_entries(lines[listmap_i + 1:qclose_i], attach_comments=True)
o_map_i = idx(lambda l: 'Map(' in l, odef_i)
o_entries = split_entries(lines[o_map_i + 1:oclose_i], attach_comments=True)

qnames = [n for n, _ in q_entries]
onames = [n for n, _ in o_entries]
assert set(qnames) == set(onames), set(qnames) ^ set(onames)
print(f'{len(qnames)} queries parsed')

groups = json.load(open('/tmp/qgroups.json'))
assert set(groups) == set(qnames)

helpers = lines[helpers_i - 0:qdoc_i] + [''] + lines[dhash_i:odef_i]
# strip trailing blank lines
while helpers and helpers[-1].strip() == '':
    helpers.pop()
helpers = [re.sub(r'^  private (def|val|lazy val)', r'  private[graft] \1', l)
           for l in helpers]

imports_txt = '\n'.join(head_imports).rstrip() + '\n'

os.makedirs('src/main/scala/graft/registry', exist_ok=True)

with open('src/main/scala/graft/registry/QueryHelpers.scala', 'w') as f:
    f.write('''package graft

import graft.operators._
import graft.sources.{Io, Tables}
import org.apache.spark.sql.functions._

/** Shared plumbing for the per-family query registries: the scratch-dir
  * helpers and every composable DuckDB-oracle SQL fragment (CTE chains
  * reused across queries). Split out of SparkEntry so each registry file
  * stays reviewable; see SparkEntry for the assembled driver contract.
  */
private[graft] object QueryHelpers {
''')
    f.write('\n'.join(helpers))
    f.write('\n}\n')

FAMDOC = {
    'RefQueries': 'reference analytics: evidence dating, ontology propagation,\n  * association scoring, novelty, and the reference rollup reports (SURVEY.md\n  * families A-E)',
    'StatsQueries': 'relational + statistics: TPC-H-style relational queries and\n  * the experiment/statistics family (SURVEY.md family F)',
    'PipelineQueries': 'training-data pipeline: dedup, ANN/embeddings, sampling,\n  * multimodal, graph (SURVEY.md family G, data side)',
    'TextQueries': 'text-corpus analysis: language-ID, quality, LM stats,\n  * keyword/IR scores (SURVEY.md family G, text side)',
    'EventQueries': 'event analytics: windows, sessions, funnels, retention, and\n  * the streaming replays (SURVEY.md family H)',
    'InfraQueries': 'infrastructure: IO, layout, sketches, incremental/CDC,\n  * profiling (SURVEY.md family I)',
}

fam_entries = collections.defaultdict(lambda: ([], []))
for n, chunk in q_entries:
    fam_entries[groups[n]][0].append((n, chunk))
for n, chunk in o_entries:
    fam_entries[groups[n]][1].append((n, chunk))

for fam, (qs, os_) in fam_entries.items():
    with open(f'src/main/scala/graft/registry/{fam}.scala', 'w') as f:
        f.write('package graft\n\n')
        f.write('''import graft.operators._
import graft.sources.{Io, Tables}
import graft.streaming.{AssociationStream, EventStream, StreamQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import QueryHelpers._

''')
        f.write(f'/** Registry shard — {FAMDOC[fam]}.\n'
                '  *\n'
                '  * Every query here has its DuckDB oracle co-located below with\n'
                '  * IDENTICAL column names (the driver contract; see SparkEntry).\n'
                '  */\n')
        f.write(f'private[graft] object {fam} {{\n\n')
        f.write('  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(\n')
        for n, chunk in qs:
            f.write('\n'.join(chunk).rstrip() + '\n')
        f.write('  )\n\n')
        f.write('  val oracles: Seq[(String, String)] = Seq(\n')
        for n, chunk in os_:
            f.write('\n'.join(chunk).rstrip() + '\n')
        f.write('  )\n}\n')
    print(fam, len(qs), 'queries')

# ---- new SparkEntry ----
bench_order = ',\n'.join('    "%s"' % n for n in qnames)
fams = sorted(fam_entries)
shard_lines = ',\n'.join(f'      ({f}.queries, {f}.oracles)' for f in fams)
with open(SRC, 'w') as f:
    f.write('''package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — query registry + DuckDB oracle SQL, assembled from
  * the per-family shards under graft/registry/ (queries and oracles
  * co-located per family; shared SQL fragments in QueryHelpers).
  *
  * Column names are aligned between each query and its oracle (the
  * driver sorts columns by name before hashing). All float outputs are
  * rounded only at the final projection on both sides (SURVEY.md §3).
  */
object SparkEntry {

  /** Flagship: the reference's complete pipeline — indirect evidence →
    * cumulative per-source scores → weighted overall → novelty — on
    * sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q10_full_pipeline")(spark, "/root/testdata/sf0.001")

  /** The registry shards. Adding a query = add it (query + oracle) to
    * ONE shard AND append its name to [[BenchOrder]]; the assembly
    * below fails loudly on any mismatch, so a forgotten side cannot
    * ship silently.
    */
  private def shards: Seq[(Seq[(String, (SparkSession, String) => DataFrame)], Seq[(String, String)])] =
    Seq(
''' + shard_lines + ''')

  /** Bench-order pin: the registry order BENCH_r01-r08 measured in, so
    * per-query bench series stay diffable across rounds. Append new
    * queries at the end.
    */
  private val BenchOrder: Seq[String] = Seq(
''' + bench_order + ''')

  private def assemble[T](pick: Seq[(String, T)]): Map[String, T] = {
    val all = pick.toMap
    require(pick.size == all.size, "duplicate query name across shards")
    require(all.keySet == BenchOrder.toSet,
      "registry/BenchOrder mismatch: " +
        ((all.keySet diff BenchOrder.toSet) ++ (BenchOrder.toSet diff all.keySet))
          .mkString(", "))
    scala.collection.immutable.ListMap(BenchOrder.map(n => n -> all(n)): _*)
  }

  /** Insertion-ordered (BenchOrder) so Bench measures queries in a
    * deterministic, comparable order across runs and rounds.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    assemble(shards.flatMap(_._1))

  def oracleSql: Map[String, String] =
    assemble(shards.flatMap(_._2))
}
''')
print('SparkEntry.scala rewritten')

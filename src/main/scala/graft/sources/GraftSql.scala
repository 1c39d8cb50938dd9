package graft.sources

import java.util.UUID

import org.apache.spark.sql.functions.{expr, lit}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Textual SQL front-end for the statements Spark SQL cannot route to
  * path-based [[VersionedTable]]s — the spellings a lakehouse user types
  * first ([[VersionedTable.mergeInto]] / [[VersionedTable.readVersion]]
  * are the API ancestors; reference analogue: the STM upsert surface,
  * hive-task src/primitives.lisp:252–266, which likewise pairs a
  * programmatic verb with the caller-facing entry):
  *
  *  - `CREATE VERSIONED TABLE '<table-path>' [CLUSTER BY (c, ...)] AS
  *    SELECT ...` bootstraps a table (fails if it exists; CLUSTER BY
  *    range-clusters the first snapshot and writes its zone-map sidecar,
  *    so SQL-born tables prune from birth) and `INSERT INTO
  *    '<table-path>' SELECT ... | VALUES (...)` appends in O(new data) via
  *    [[VersionedTable.append]] (the new batch's dir joins the manifest;
  *    no table rewrite — SELECT binds by name, VALUES by position), so a
  *    SQL-only user can create, load, mutate, and time-travel end to end;
  *    `CONVERT TO VERSIONED '<table-path>' FROM '<parquet-dir>'` adopts
  *    an existing parquet directory as v1 zero-copy
  *    ([[VersionedTable.convert]] — one metadata write; the source is
  *    referenced, never rewritten or vacuumed);
  *  - `CLONE '<source-path>' TO '<target-path>' [VERSION AS OF <n>]`
  *    ([[VersionedTable.shallowClone]] — zero-copy fork: v1 references
  *    the source's data dirs; constraints + skipping policy cloned);
  *  - `INSERT OVERWRITE '<table-path>' WHERE <cond> SELECT ...|VALUES ...`
  *    ([[VersionedTable.overwriteWhere]] — atomically replace exactly
  *    the predicate's region; every inserted row must satisfy it);
  *  - `ENABLE CHANGE FEED '<table-path>'`
  *    ([[VersionedTable.enableChangeFeed]] — opt into the streaming
  *    `_cdf/` mirror; returns the versions backfilled now);
  *  - `MERGE INTO '<table-path>' USING <source> ON <key> WHEN ... THEN ...`
  *    compiles to [[VersionedTable.mergeInto]] (one atomic commit);
  *  - `DELETE FROM '<table-path>' WHERE <cond> DEFERRED` — merge-on-read
  *    delete ([[VersionedTable.deleteWhereLazy]]): O(metadata), no rewrite
  *  - `DELETE FROM '<table-path>' WHERE <cond>` / `UPDATE '<table-path>'
  *    SET c = expr[, ...] WHERE <cond>` compile to the copy-on-write
  *    [[VersionedTable.deleteWhere]]/[[VersionedTable.updateWhere]]
  *    (base-pinned: a racing commit conflicts instead of being lost);
  *  - `SELECT ... FROM '<table-path>' VERSION AS OF <n> ...` rewrites the
  *    time-travel reference to a temp view over
  *    [[VersionedTable.readVersion]] and hands the query to `spark.sql`;
  *    `FROM '<table-path>' TIMESTAMP AS OF '<ts>'` resolves a wall-clock
  *    instant to its version ([[VersionedTable.readAsOf]] — monotonicized
  *    commit stamps, the Delta convention); `FROM '<table-path>' LATEST`
  *    reads the newest version (the LATEST marker is required so string
  *    literals that look like paths are never rewritten);
  *  - `VACUUM '<table-path>' RETAIN <n> HOURS`, `COMPACT MANIFESTS
  *    '<table-path>' [KEEP <n>]`, `DESCRIBE HISTORY '<table-path>'`,
  *    `OPTIMIZE '<table-path>' [TARGET <n> MB] [CLUSTER BY (c, ...) |
  *    ZORDER BY (a, b)]` (Z-order rewrites the snapshot on the Morton
  *    interleave so either dimension prunes — commitZordered's layout,
  *    available post-hoc),
  *    `SET SKIPPING ON '<table-path>' STATS (c, ...) [BLOOM (c, ...)]
  *    [BITS <n>]`, `DESCRIBE SKIPPING '<table-path>'`, `EXPIRE VERSIONS
  *    '<table-path>' KEEP <n> | OLDER THAN <n> HOURS` (physical version
  *    retirement, count- or age-based — pair with
  *    VACUUM for erasure), `RESTORE '<table-path>' TO VERSION <n>`
  *    (roll back as a new forward version), `REFRESH ROLLUP '<target>'
  *    FROM '<base>' KEY <k> | KEY (k1, k2, ...) SUM (c, ...)
  *    [MIN (c, ...)] [MAX (c, ...)]`
  *    (churn-bound incremental materialized rollup, composite keys ride
  *    the same path; MIN/MAX are exact even under deletes because every
  *    touched group re-aggregates from the snapshot — the refresh never
  *    subtracts deltas; empty result = already current), `ADD CONSTRAINT
  *    '<table-path>' <name> CHECK (<expr>)` (additive and ATOMIC; later
  *    commits abort on violation — racing ADDs both survive via
  *    [[VersionedTable.addConstraints]]'s generation CAS),
  *    `ALTER TABLE '<table-path>' ADD COLUMN <name> <type> [DEFAULT
  *    <expr>] | RENAME COLUMN <old> TO <new> | DROP COLUMN <name>
  *    | ALTER COLUMN <name> TYPE <type>`
  *    (O(metadata) schema evolution — [[VersionedTable.addColumn]]/
  *    [[VersionedTable.renameColumn]]/[[VersionedTable.dropColumn]]/
  *    [[VersionedTable.widenColumn]] (lossless widenings only): no
  *    data rewrite; readers map old dirs to the logical schema and any
  *    copy-on-write verb materializes it),
  *    `DESCRIBE CONSTRAINTS '<table-path>'`,
  *    `ENSURE STATS ON '<table-path>' [VERSION <n>] STATS (c, ...)
  *    [BLOOM (c, ...)] [BITS <n>]` (retro-backfill of the skipping
  *    sidecars for one committed version),
  *    `MIRROR CHANGE FEED '<table-path>'` (self-healing `_cdf` catch-up
  *    pass; returns the versions mirrored now),
  *    `READ CHANGES '<table-path>' VERSION <n>` (one version's change
  *    batch, `__op`/`__ver`-tagged), `READ CHANGES '<table-path>'
  *    VERSION <from> TO <to>` (bounded window, `_commit_version`-tagged,
  *    mirror-first so it crosses compaction horizons —
  *    [[VersionedTable.readChanges]]) — the
  *    maintenance verbs, statement-spelled;
  *  - anything else passes through to `spark.sql` untouched.
  *
  * NAME-ADDRESSED tables ([[GraftCatalog]] — the "Spark SQL + Hive
  * metastore" binding): `CREATE VERSIONED TABLE <db>.<name>
  * [CLUSTER BY (...)] [LOCATION '<path>'] AS SELECT ...` commits v1 and
  * binds the name (LOCATION defaults under the warehouse dir);
  * `CREATE VERSIONED TABLE <db>.<name> LOCATION '<path>'` (no AS
  * SELECT) ADOPTS an existing versioned table — the relocation path;
  * `DROP VERSIONED TABLE <db>.<name> [PURGE]` unbinds (metadata-only
  * by default, PURGE erases the manifest root); `SHOW VERSIONED TABLES
  * [IN <db>]` lists bindings. After CREATE, EVERY statement above —
  * mutation verbs, maintenance verbs, `SELECT ... FROM <db>.<name>
  * [VERSION|TIMESTAMP AS OF ...]` — takes the bare name in place of the
  * quoted path: a pre-pass resolves registered names through the
  * session catalog (in-memory or Hive — same SQL both ways) and
  * unregistered `a.b` tokens (column refs, foreign metastore tables)
  * pass through untouched. A name in FROM/JOIN/USING position without a
  * time-travel suffix reads the LATEST snapshot (names need no LATEST
  * marker — unlike a quoted path, a name cannot be mistaken for a
  * string literal).
  *
  * Deliberately thin: a regex statement grammar, not a full parser — the
  * heavy lifting (atomicity, schema evolution, optimistic concurrency,
  * the one-keyed-shuffle merge plan) lives in the verbs it compiles to.
  *
  * MERGE grammar (case-insensitive):
  * {{{
  *   MERGE INTO '<path>' | `<path>`            -- the versioned table root
  *   USING <view-name> | ( <subquery> ) [AS a]
  *   ON <key> | t.<key> = s.<key>              -- same column name per side
  *   WHEN MATCHED AND <cond> THEN DELETE       -- cond sees the SOURCE row
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  *   WHEN MATCHED [AND <cond>] THEN UPDATE SET c = expr[, ...] -- ALONE
  * }}}
  * The `*`-forms have full-row semantics (upserts replace/insert the
  * whole source row). The assignments form (r17) compiles to
  * [[VersionedTable.mergeUpdate]]: matched rows re-evaluate ONLY the
  * named columns — expressions see the old row as `t` and the source
  * row as `s` — unmentioned columns survive verbatim, unmatched source
  * keys are ignored, and the verb stays O(matched files + batch).
  * Clause rules (the combinations the verb's semantics honestly express):
  * an upsert merge needs BOTH `UPDATE SET *` and `INSERT *`; a
  * conditional DELETE may accompany them; `WHEN MATCHED THEN DELETE`
  * without a condition is only legal ALONE (a pure delete-merge — with an
  * INSERT clause present the verb could not distinguish "unmatched row to
  * insert" from "matched row to delete", since the delete predicate sees
  * the source row, not matched-ness). Returns a 1-row (version) frame.
  */
object GraftSql {

  private val MergeStmt =
    """(?is)\s*MERGE\s+INTO\s+(?:'([^']+)'|`([^`]+)`)\s+USING\s+""" +
      """(\((?:[^()]|\([^()]*\))*\)|[\w.]+)(?:\s+AS\s+(\w+))?\s+""" +
      """ON\s+(.+?)\s*(\bWHEN\b.+?)\s*;?\s*"""
  private val MergeRe = MergeStmt.r

  private val WhenRe =
    ("""(?is)WHEN\s+(NOT\s+)?MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+""" +
      """(DELETE|INSERT\s+\*|UPDATE\s+SET\s+.+?)\s*""" +
      """(?=WHEN\s+(?:NOT\s+)?MATCHED|$)""").r

  private val OnEqRe =
    """(?is)\s*(?:(\w+)\.)?(\w+)\s*=\s*(?:(\w+)\.)?(\w+)\s*""".r
  private val OnBareRe = """(?is)\s*`?(\w+)`?\s*""".r

  private val VersionRefRe =
    """(?is)(?:'([^']+)'|`([^`]+)`)\s+(?:FOR\s+)?VERSION\s+AS\s+OF\s+(\d+)""".r
  private val TimestampRefRe =
    ("""(?is)(?:'([^']+)'|`([^`]+)`)\s+(?:FOR\s+)?TIMESTAMP\s+AS\s+OF""" +
      """\s+'([^']+)'""").r
  // the LATEST marker is required: a bare quoted path is indistinguishable
  // from a string literal, and a rewrite inside WHERE s = '/x/y' would
  // corrupt the query
  private val LatestRefRe =
    """(?is)(?:'([^']+)'|`([^`]+)`)\s+LATEST\b""".r

  private val VacuumRe =
    """(?is)\s*VACUUM\s+(?:'([^']+)'|`([^`]+)`)\s+RETAIN\s+(\d+)\s+HOURS\s*;?\s*""".r
  private val CompactRe =
    """(?is)\s*COMPACT\s+MANIFESTS\s+(?:'([^']+)'|`([^`]+)`)(?:\s+KEEP\s+(\d+))?\s*;?\s*""".r
  private val HistoryRe =
    """(?is)\s*DESCRIBE\s+HISTORY\s+(?:'([^']+)'|`([^`]+)`)\s*;?\s*""".r
  private val DescSkipRe =
    """(?is)\s*DESCRIBE\s+SKIPPING\s+(?:'([^']+)'|`([^`]+)`)\s*;?\s*""".r
  private val AddConstraintRe =
    ("""(?is)\s*ADD\s+CONSTRAINT\s+(?:'([^']+)'|`([^`]+)`)""" +
      """\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""").r
  private val DescConstraintsRe =
    """(?is)\s*DESCRIBE\s+CONSTRAINTS\s+(?:'([^']+)'|`([^`]+)`)\s*;?\s*""".r
  private val RollupRe =
    ("""(?is)\s*REFRESH\s+ROLLUP\s+(?:'([^']+)'|`([^`]+)`)""" +
      """\s+FROM\s+(?:'([^']+)'|`([^`]+)`)""" +
      """\s+KEY\s+(?:\(\s*(\w+(?:\s*,\s*\w+)*)\s*\)|(\w+))""" +
      """\s+SUM\s*\(\s*(\w*(?:\s*,\s*\w+)*)\s*\)""" +
      """(?:\s+MIN\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\))?""" +
      """(?:\s+MAX\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\))?\s*;?\s*""").r
  private val RestoreRe =
    ("""(?is)\s*RESTORE\s+(?:'([^']+)'|`([^`]+)`)""" +
      """\s+TO\s+VERSION\s+(\d+)\s*;?\s*""").r
  private val ExpireRe =
    ("""(?is)\s*EXPIRE\s+VERSIONS\s+(?:'([^']+)'|`([^`]+)`)""" +
      """\s+KEEP\s+(\d+)\s*;?\s*""").r
  private val ConvertRe =
    ("""(?is)\s*CONVERT\s+TO\s+VERSIONED\s+(?:'([^']+)'|`([^`]+)`)""" +
      """\s+FROM\s+(?:'([^']+)'|`([^`]+)`)\s*;?\s*""").r
  private val ExpireAgeRe =
    ("""(?is)\s*EXPIRE\s+VERSIONS\s+(?:'([^']+)'|`([^`]+)`)""" +
      """\s+OLDER\s+THAN\s+(\d+)\s+HOURS\s*;?\s*""").r
  // matched BEFORE DeleteRe: the trailing DEFERRED keyword selects the
  // merge-on-read verb (deleteWhereLazy — O(metadata), no rewrite)
  private val DeleteLazyRe =
    ("""(?is)\s*DELETE\s+FROM\s+(?:'([^']+)'|`([^`]+)`)""" +
      """\s+WHERE\s+(.+?)\s+DEFERRED\s*;?\s*""").r
  private val DeleteRe =
    ("""(?is)\s*DELETE\s+FROM\s+(?:'([^']+)'|`([^`]+)`)""" +
      """\s+WHERE\s+(.+?)\s*;?\s*""").r
  private val UpdateRe =
    ("""(?is)\s*UPDATE\s+(?:'([^']+)'|`([^`]+)`)""" +
      """\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*;?\s*""").r
  private val AssignRe = """(?s)\s*`?(\w+)`?\s*=\s*(.+)\s*""".r
  private val CompactSmallRe =
    ("""(?is)\s*OPTIMIZE\s+(?:'([^']+)'|`([^`]+)`)""" +
      """\s+COMPACT\s+UNDER\s+(\d+)\s+MB""" +
      """(?:\s+TARGET\s+(\d+)\s+MB)?\s*;?\s*""").r
  private val OptimizeRe =
    ("""(?is)\s*OPTIMIZE\s+(?:'([^']+)'|`([^`]+)`)""" +
      """(?:\s+TARGET\s+(\d+)\s+MB)?""" +
      """(?:\s+CLUSTER\s+BY\s+\(?\s*(\w+(?:\s*,\s*\w+)*)\s*\)?""" +
      """|\s+ZORDER\s+BY\s+\(?\s*(\w+)\s*,\s*(\w+)\s*\)?)?\s*;?\s*""").r
  private val CreateRe =
    ("""(?is)\s*CREATE\s+VERSIONED\s+TABLE\s+(?:'([^']+)'|`([^`]+)`)""" +
      """(?:\s+CLUSTER\s+BY\s+\(\s*(\w+(?:\s*,\s*\w+)*)\s*\))?""" +
      """\s+AS\s+(SELECT\b.+?)\s*;?\s*""").r
  private val InsertRe =
    ("""(?is)\s*INSERT\s+INTO\s+(?:'([^']+)'|`([^`]+)`)""" +
      """\s+(SELECT\b.+?|VALUES\b.+?)\s*;?\s*""").r
  // the WHERE condition is everything up to the first top-level SELECT/
  // VALUES keyword (lazy match) — a predicate containing a subquery needs
  // the Scala verb
  private val InsertOverwriteRe =
    ("""(?is)\s*INSERT\s+OVERWRITE\s+(?:'([^']+)'|`([^`]+)`)""" +
      """\s+WHERE\s+(.+?)\s+(SELECT\b.+?|VALUES\b.+?)\s*;?\s*""").r
  private val CloneRe =
    ("""(?is)\s*CLONE\s+(?:'([^']+)'|`([^`]+)`)""" +
      """\s+TO\s+(?:'([^']+)'|`([^`]+)`)""" +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""").r
  private val EnableCdfRe =
    """(?is)\s*ENABLE\s+CHANGE\s+FEED\s+(?:'([^']+)'|`([^`]+)`)\s*;?\s*""".r
  // column targets accept dotted NESTED paths (r15): `props.device_os`
  // addresses a field inside a StructType column — the verbs validate
  private val AlterRenameRe =
    ("""(?is)\s*ALTER\s+TABLE\s+(?:'([^']+)'|`([^`]+)`)\s+RENAME\s+""" +
      """COLUMN\s+`?([\w.]+)`?\s+TO\s+`?(\w+)`?\s*;?\s*""").r
  private val AlterDropRe =
    ("""(?is)\s*ALTER\s+TABLE\s+(?:'([^']+)'|`([^`]+)`)\s+DROP\s+""" +
      """COLUMN\s+`?([\w.]+)`?\s*;?\s*""").r
  // the type is captured lazily up to the optional DEFAULT keyword / end
  // of statement and validated by DataType.fromDDL inside addColumn — a
  // shape grammar here couldn't parse nested types (MAP<STRING,
  // ARRAY<INT>> has inner '>'s) or multi-word ones (DOUBLE PRECISION),
  // and silently falling through to the spark.sql passthrough surfaced
  // as an opaque Spark parse error instead of a Graft ALTER error
  private val AlterAddRe =
    ("""(?is)\s*ALTER\s+TABLE\s+(?:'([^']+)'|`([^`]+)`)\s+ADD\s+""" +
      """COLUMN\s+`?([\w.]+)`?\s+(.+?)""" +
      """(?:\s+DEFAULT\s+(.+?))?\s*;?\s*""").r
  private val AlterWidenRe =
    ("""(?is)\s*ALTER\s+TABLE\s+(?:'([^']+)'|`([^`]+)`)\s+ALTER\s+""" +
      """COLUMN\s+`?([\w.]+)`?\s+TYPE\s+(.+?)\s*;?\s*""").r

  private val SkippingRe =
    ("""(?is)\s*SET\s+SKIPPING\s+ON\s+(?:'([^']+)'|`([^`]+)`)""" +
      """\s+STATS\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\)""" +
      """(?:\s+BLOOM\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\))?""" +
      """(?:\s+BITS\s+(\d+))?\s*;?\s*""").r
  // retro-backfill of the zone-map/Bloom sidecars for one committed
  // version (default: latest) — the statement dual of ensureStats
  private val EnsureStatsRe =
    ("""(?is)\s*ENSURE\s+STATS\s+ON\s+(?:'([^']+)'|`([^`]+)`)""" +
      """(?:\s+VERSION\s+(\d+))?""" +
      """\s+STATS\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\)""" +
      """(?:\s+BLOOM\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\))?""" +
      """(?:\s+BITS\s+(\d+))?\s*;?\s*""").r
  private val MirrorCdfRe =
    ("""(?is)\s*MIRROR\s+CHANGE\s+FEED\s+""" +
      """(?:'([^']+)'|`([^`]+)`)\s*;?\s*""").r
  private val ReadChangesRangeRe =
    ("""(?is)\s*READ\s+CHANGES\s+(?:'([^']+)'|`([^`]+)`)""" +
      """\s+VERSION\s+(\d+)\s+TO\s+(\d+)\s*;?\s*""").r
  private val ReadChangesRe =
    ("""(?is)\s*READ\s+CHANGES\s+(?:'([^']+)'|`([^`]+)`)""" +
      """\s+VERSION\s+(\d+)\s*;?\s*""").r

  // ───────────────── name-addressed tables (GraftCatalog) ─────────────
  // `CREATE VERSIONED TABLE db.t ...` / `DROP VERSIONED TABLE db.t`
  // operate on the NAME itself, so they match BEFORE the resolution
  // pre-pass (which would rewrite a registered name to its path). A
  // CREATE may bootstrap (AS SELECT — LOCATION optional, defaulting
  // under the warehouse dir) or ADOPT an existing versioned table
  // (LOCATION only, no AS SELECT).
  private val CreateNamedRe =
    ("""(?is)\s*CREATE\s+VERSIONED\s+TABLE\s+""" +
      """([A-Za-z_]\w*\.[A-Za-z_]\w*)""" +
      """(?:\s+CLUSTER\s+BY\s+\(\s*(\w+(?:\s*,\s*\w+)*)\s*\))?""" +
      """(?:\s+LOCATION\s+'([^']+)')?""" +
      """(?:\s+AS\s+(SELECT\b.+?))?\s*;?\s*""").r
  private val DropNamedRe =
    ("""(?is)\s*DROP\s+VERSIONED\s+TABLE\s+""" +
      """([A-Za-z_]\w*\.[A-Za-z_]\w*)(\s+PURGE)?\s*;?\s*""").r
  private val ShowNamedRe =
    """(?is)\s*SHOW\s+VERSIONED\s+TABLES(?:\s+IN\s+([A-Za-z_]\w*))?\s*;?\s*""".r
  // candidate db.table tokens for the resolution pre-pass: a qualified
  // identifier not adjoining a quote/backtick/longer dotted chain
  private val QualifiedNameRe =
    """(?<![\w.'`])[A-Za-z_]\w*\.[A-Za-z_]\w*(?![\w.('`])""".r
  private val TimeTravelSuffixRe =
    """(?is)^\s+(?:FOR\s+)?(?:VERSION\s+AS\s+OF|TIMESTAMP\s+AS\s+OF|LATEST\b)""".r
  // the two words before a name decide its position: a read reference
  // (FROM/JOIN/USING — becomes a snapshot view) vs a verb operand
  // (DELETE FROM / INSERT INTO / MERGE INTO / ... — becomes the quoted
  // path the statement grammar takes)
  private val PrevWordsRe = """(?:(\w+)\s+)?(\w+)\s*$""".r

  /** Execute one statement; see the object doc for the grammar. The
    * maintenance statements mirror their verbs 1:1:
    * `VACUUM '<path>' RETAIN <n> HOURS` → [[VersionedTable.vacuum]]
    * (returns the reclaimed dirs); `COMPACT MANIFESTS '<path>'
    * [KEEP <n>]` → [[VersionedTable.compactManifests]] (returns the
    * retired-manifest count); `DESCRIBE HISTORY '<path>'` → one row per
    * committed version, ascending.
    */
  /** Whether a Spark-UNPARSEABLE statement belongs to this grammar —
    * the session-parser extension's gate ([[GraftSqlParser]]): the
    * delegate parser runs first, so only text Spark itself rejects
    * reaches this check. Deliberately LOOSE (head keywords + quoted-path
    * DML targets + time-travel refs, names or paths): a
    * recognized-but-malformed statement gets this grammar's typed
    * error, which names the supported spelling — strictly more useful
    * than the delegate's ParseException; an unrecognized one surfaces
    * Spark's own error untouched.
    */
  /** Leading SQL comments stripped — a "-- nightly maintenance\nVACUUM
    * ..." script line is the same statement, but neither the
    * head-keyword gate nor this grammar's anchored regexes would see
    * through the prefix. The PARSER path strips before dispatching here
    * for exactly that reason.
    */
  private[sources] def stripLeadingComments(statement: String): String =
    statement.replaceAll("(?s)\\A(?:\\s*(?:--[^\\n]*\\n?|/\\*.*?\\*/))*", "")

  def recognizes(statement: String): Boolean = {
    val uncommented = stripLeadingComments(statement)
    val norm = uncommented.trim.toUpperCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ")
    val heads = Seq("VACUUM ", "OPTIMIZE ", "RESTORE ", "EXPIRE VERSIONS ",
      "CONVERT TO VERSIONED ", "COMPACT MANIFESTS ", "DESCRIBE HISTORY ",
      "DESCRIBE SKIPPING ", "DESCRIBE CONSTRAINTS ", "REFRESH ROLLUP ",
      "SET SKIPPING ON ", "ENSURE STATS ON ", "MIRROR CHANGE FEED ",
      "READ CHANGES ", "ENABLE CHANGE FEED ", "CLONE ",
      "CREATE VERSIONED TABLE ", "DROP VERSIONED TABLE ",
      "SHOW VERSIONED TABLES")
    heads.exists(norm.startsWith) ||
      // DML / DDL whose TARGET is a quoted path (never Spark-parseable)
      """(?is)^\s*(MERGE\s+INTO|DELETE\s+FROM|UPDATE|INSERT\s+INTO|INSERT\s+OVERWRITE|ALTER\s+TABLE|CREATE\s+TABLE)\s+['`]"""
        .r.findFirstIn(uncommented).isDefined ||
      // SELECTs over quoted-path time travel
      VersionRefRe.findFirstIn(statement).isDefined ||
      TimestampRefRe.findFirstIn(statement).isDefined ||
      LatestRefRe.findFirstIn(statement).isDefined
  }

  def sql(spark: SparkSession, statement: String): DataFrame = {
    import spark.implicits._
    statement match {
      // name-DEFINING statements first — the resolution pre-pass below
      // must never rewrite the very name being created or dropped
      case CreateNamedRe(name, cluster, location, select) =>
        return createNamed(spark, name, Option(cluster), Option(location),
          Option(select))
      case DropNamedRe(name, purge) =>
        val loc = GraftCatalog.drop(spark, name, purge = purge != null)
        return Seq(loc).toDF("dropped_location")
      case ShowNamedRe(db) =>
        return GraftCatalog.list(spark, Option(db))
          .toDF("name", "location")
      case _ => ()
    }
    // per-STATEMENT temp views (the time-travel / name rewrites below)
    // are registered during the rewrite and dropped once the statement's
    // DataFrame is analyzed — resolution bakes the snapshot plan into
    // the Dataset, so the view is pure scaffolding afterwards. UUID
    // names make concurrent statements independent (a shared
    // deterministic slot let thread B createOrReplace the snapshot
    // under thread A between rewrite and analysis) and collision-free
    // by construction (the previous 32-bit path hash could silently
    // alias two registered tables onto one view); dropping bounds
    // session-catalog growth to the statements in flight.
    val views = scala.collection.mutable.Buffer.empty[String]
    try sqlResolved(spark, resolveNames(spark, statement, views), views)
    finally dropViews(spark, views)
  }

  private def dropViews(spark: SparkSession,
      views: scala.collection.mutable.Buffer[String]): Unit =
    views.foreach { v =>
      try { spark.catalog.dropTempView(v); () }
      catch { case scala.util.control.NonFatal(_) => () }
    }

  private def freshView(prefix: String): String =
    prefix + java.util.UUID.randomUUID.toString.replace("-", "")

  /** [[sql]] after the name→path pre-pass — every table reference is a
    * quoted path (or a temp view) from here on.
    */
  private def sqlResolved(spark: SparkSession, statement: String,
      views: scala.collection.mutable.Buffer[String]): DataFrame = {
    import spark.implicits._
    statement match {
      case MergeRe(p1, p2, source, alias, on, whens) =>
        merge(spark, Option(p1).getOrElse(p2), source, Option(alias), on,
          whens, views)
      case VacuumRe(p1, p2, hours) =>
        VersionedTable.vacuum(spark, Option(p1).getOrElse(p2),
            graceMs = hours.toLong * 3600L * 1000L)
          .toDF("reclaimed_dir")
      case CompactRe(p1, p2, keep) =>
        val n = VersionedTable.compactManifests(spark,
          Option(p1).getOrElse(p2),
          keepRecent = Option(keep).map(_.toInt).getOrElse(8))
        Seq(n).toDF("manifests_retired")
      case HistoryRe(p1, p2) =>
        VersionedTable.history(spark, Option(p1).getOrElse(p2))
      case SkippingRe(p1, p2, statsC, bloomC, bits) =>
        def split(s: String) = Option(s).toSeq.flatMap(_.split(","))
          .map(_.trim).filter(_.nonEmpty)
        VersionedTable.setSkippingPolicy(spark, Option(p1).getOrElse(p2),
          statsCols = split(statsC), bloomCols = split(bloomC),
          bloomBitsPerRow = Option(bits).map(_.toInt).getOrElse(10))
        Seq("ok").toDF("skipping_policy")
      case EnsureStatsRe(p1, p2, ver, statsC, bloomC, bits) =>
        def split(s: String) = Option(s).toSeq.flatMap(_.split(","))
          .map(_.trim).filter(_.nonEmpty)
        val tbl = Option(p1).getOrElse(p2)
        val v = Option(ver).map(_.toLong).getOrElse(
          VersionedTable.latestVersion(spark, tbl).getOrElse(
            fail(s"versioned table '$tbl' has no committed versions")))
        val rewrote = VersionedTable.ensureStats(spark, tbl, v,
          cols = split(statsC), bloomCols = split(bloomC),
          bloomBitsPerRow = Option(bits).map(_.toInt).getOrElse(10))
        Seq(rewrote).toDF("stats_rewritten")
      case MirrorCdfRe(p1, p2) =>
        VersionedTable.mirrorChangeFeed(spark, Option(p1).getOrElse(p2))
          .toDF("version_mirrored")
      case ReadChangesRangeRe(p1, p2, from, to) =>
        VersionedTable.readChanges(spark, Option(p1).getOrElse(p2),
          from.toLong, to.toLong)
      case ReadChangesRe(p1, p2, ver) =>
        VersionedTable.readChanges(spark, Option(p1).getOrElse(p2),
          ver.toLong)
      case CompactSmallRe(p1, p2, underMb, targetMb) =>
        // file-granular small-file compaction: only files under the
        // threshold rewrite; the rest are referenced in place
        val under = underMb.toLong << 20
        Seq(VersionedTable.compactSmallFiles(spark,
          Option(p1).getOrElse(p2), minFileBytes = under,
          targetFileBytes = Option(targetMb).map(_.toLong << 20)
            .getOrElse(math.max(under, 128L << 20))))
          .toDF("version")
      case OptimizeRe(p1, p2, mb, cluster, za, zb) =>
        val v = VersionedTable.optimize(spark, Option(p1).getOrElse(p2),
          targetFileBytes =
            Option(mb).map(_.toLong << 20).getOrElse(128L << 20),
          clusterCols = Option(cluster).toSeq
            .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
          zorderCols = (Option(za) zip Option(zb))
            .map { case (a, b) => Seq(a, b) }.getOrElse(Nil))
        Seq(v).toDF("version")
      case DescSkipRe(p1, p2) =>
        VersionedTable.describeSkipping(spark, Option(p1).getOrElse(p2))
      case AddConstraintRe(p1, p2, name, check) =>
        val tbl = Option(p1).getOrElse(p2)
        // additive AND atomic: racing ADDs both survive (the generation
        // CAS re-reads and retries the loser — no read-modify-write)
        VersionedTable.addConstraints(spark, tbl, Map(name -> check.trim))
        Seq(name).toDF("constraint_added")
      case DescConstraintsRe(p1, p2) =>
        VersionedTable.constraintsOf(spark, Option(p1).getOrElse(p2))
          .toDF("name", "expression")
      case AlterRenameRe(p1, p2, from, to) =>
        Seq(VersionedTable.renameColumn(spark, Option(p1).getOrElse(p2),
          from, to)).toDF("version")
      case AlterDropRe(p1, p2, name) =>
        Seq(VersionedTable.dropColumn(spark, Option(p1).getOrElse(p2),
          name)).toDF("version")
      case AlterAddRe(p1, p2, name, tpe, dflt) =>
        Seq(VersionedTable.addColumn(spark, Option(p1).getOrElse(p2),
          name, tpe.trim, Option(dflt).map(_.trim))).toDF("version")
      case AlterWidenRe(p1, p2, name, tpe) =>
        Seq(VersionedTable.widenColumn(spark, Option(p1).getOrElse(p2),
          name, tpe.trim)).toDF("version")
      case RollupRe(t1, t2, b1, b2, keyList, key, sums, mins, maxs) =>
        // KEY k or KEY (k1, k2, ...) — composite rollups ride the same
        // incremental path since r13; MIN/MAX clauses since r14 (SUM ()
        // is legal when only extrema are wanted)
        def cols(s: String) = Option(s).toSeq.flatMap(_.split(","))
          .map(_.trim).filter(_.nonEmpty)
        val v = VersionedTable.refreshRollup(spark,
          baseTable = Option(b1).getOrElse(b2),
          targetTable = Option(t1).getOrElse(t2),
          keys = Option(keyList).map(_.split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq).getOrElse(Seq(key)),
          sumCols = cols(sums), minCols = cols(mins), maxCols = cols(maxs))
        v.map(Seq(_)).getOrElse(Seq.empty[Long]).toDF("version")
      case CreateRe(p1, p2, cluster, select) =>
        val tbl = Option(p1).getOrElse(p2)
        if (VersionedTable.latestVersion(spark, tbl).isDefined)
          fail(s"versioned table '$tbl' already exists — INSERT INTO it " +
            "to append, MERGE/UPDATE/DELETE to mutate, or RESTORE to " +
            "roll back")
        val df = spark.sql(rewriteTimeTravel(spark, select, views))
        val clusterCols = Option(cluster).toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        val v =
          if (clusterCols.isEmpty) VersionedTable.commit(spark, df, tbl)
          else VersionedTable.commitClustered(spark, df, tbl, clusterCols)
        Seq(v).toDF("version")
      case InsertOverwriteRe(p1, p2, cond, source) =>
        val tbl = Option(p1).getOrElse(p2)
        val raw = spark.sql(rewriteTimeTravel(spark, source, views))
        val df =
          if (source.trim.toUpperCase.startsWith("VALUES")) {
            val tableCols = VersionedTable.readLatest(spark, tbl).columns
            if (raw.columns.length != tableCols.length)
              fail(s"INSERT OVERWRITE VALUES arity ${raw.columns.length} " +
                s"!= table arity ${tableCols.length} for '$tbl'")
            raw.toDF(tableCols: _*)
          } else raw
        Seq(VersionedTable.overwriteWhere(spark, tbl, expr(cond), df))
          .toDF("version")
      case EnableCdfRe(p1, p2) =>
        VersionedTable.enableChangeFeed(spark, Option(p1).getOrElse(p2))
          .toDF("mirrored_version")
      case CloneRe(s1, s2, t1, t2, v) =>
        Seq(VersionedTable.shallowClone(spark,
          targetTable = Option(t1).getOrElse(t2),
          sourceTable = Option(s1).getOrElse(s2),
          version = Option(v).map(_.toLong))).toDF("version")
      case InsertRe(p1, p2, source) =>
        val tbl = Option(p1).getOrElse(p2)
        val raw = spark.sql(rewriteTimeTravel(spark, source, views))
        // a VALUES source has positional col1..colN names — bind them to
        // the table's columns by position (SQL INSERT semantics); SELECT
        // sources bind by NAME (append realigns order itself)
        val df =
          if (source.trim.toUpperCase.startsWith("VALUES")) {
            val tableCols = VersionedTable.readLatest(spark, tbl).columns
            if (raw.columns.length != tableCols.length)
              fail(s"INSERT VALUES arity ${raw.columns.length} != table " +
                s"arity ${tableCols.length} for '$tbl'")
            raw.toDF(tableCols: _*)
          } else raw
        Seq(VersionedTable.append(spark, tbl, df)).toDF("version")
      case RestoreRe(p1, p2, v) =>
        Seq(VersionedTable.restore(spark, Option(p1).getOrElse(p2),
          v.toLong)).toDF("version")
      case ExpireRe(p1, p2, keep) =>
        VersionedTable.expireVersions(spark, Option(p1).getOrElse(p2),
          keepLast = keep.toInt).toDF("expired_version")
      case ConvertRe(t1, t2, s1, s2) =>
        Seq(VersionedTable.convert(spark, Option(t1).getOrElse(t2),
          Option(s1).getOrElse(s2))).toDF("version")
      case ExpireAgeRe(p1, p2, hours) =>
        VersionedTable.expireVersionsOlderThan(spark,
            Option(p1).getOrElse(p2), maxAgeMs = hours.toLong * 3600L * 1000L)
          .toDF("expired_version")
      case DeleteLazyRe(p1, p2, cond) =>
        Seq(VersionedTable.deleteWhereLazy(spark,
          Option(p1).getOrElse(p2), cond)).toDF("version")
      case DeleteRe(p1, p2, cond) =>
        Seq(VersionedTable.deleteWhere(spark, Option(p1).getOrElse(p2),
          expr(cond))).toDF("version")
      case UpdateRe(p1, p2, assigns, cond) =>
        val set = splitTopLevel(assigns).map {
          case AssignRe(c, e) => c -> expr(e)
          case a => fail(s"unparseable SET assignment '$a' — use col = expr")
        }.toMap
        Seq(VersionedTable.updateWhere(spark, Option(p1).getOrElse(p2),
          expr(cond), set)).toDF("version")
      case s if VersionRefRe.findFirstIn(s).isDefined ||
          TimestampRefRe.findFirstIn(s).isDefined ||
          LatestRefRe.findFirstIn(s).isDefined =>
        spark.sql(rewriteTimeTravel(spark, s, views))
      case s => spark.sql(s)
    }
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException("GraftSql: " + msg)

  /** `CREATE VERSIONED TABLE db.t [CLUSTER BY (...)] [LOCATION '<path>']
    * [AS SELECT ...]`: with AS SELECT, commit v1 at the location
    * (defaulting under the warehouse dir, the Hive layout `<db>.db/<t>`)
    * and bind the name; without it, ADOPT the existing versioned table
    * at LOCATION (required) under the name — the relocation/re-bind
    * path. Either way the name is the only thing later statements type.
    */
  private def createNamed(spark: SparkSession, name: String,
      cluster: Option[String], location: Option[String],
      select: Option[String]): DataFrame = {
    import spark.implicits._
    if (GraftCatalog.resolve(spark, name).isDefined)
      fail(s"versioned table $name already exists — INSERT INTO it to " +
        "append, or DROP VERSIONED TABLE first")
    val loc = location.getOrElse {
      val Array(db, tbl) = name.split("\\.")
      new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), s"$db.db/$tbl").toString
    }
    val v = select match {
      case Some(sel) =>
        if (VersionedTable.latestVersion(spark, loc).isDefined)
          fail(s"a versioned table already exists at '$loc' — use CREATE " +
            "VERSIONED TABLE ... LOCATION (without AS SELECT) to adopt it")
        val views = scala.collection.mutable.Buffer.empty[String]
        try {
          val df = spark.sql(rewriteTimeTravel(spark,
            resolveNames(spark, sel, views), views))
          val clusterCols = cluster.toSeq
            .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
          if (clusterCols.isEmpty) VersionedTable.commit(spark, df, loc)
          else VersionedTable.commitClustered(spark, df, loc, clusterCols)
        } finally dropViews(spark, views)
      case None =>
        if (location.isEmpty)
          fail("CREATE VERSIONED TABLE db.t needs AS SELECT (bootstrap) " +
            "or LOCATION '<path>' (adopt an existing versioned table)")
        if (cluster.isDefined)
          fail("CLUSTER BY needs AS SELECT — adoption never rewrites data")
        VersionedTable.latestVersion(spark, loc).getOrElse(
          fail(s"no versioned table at '$loc' to adopt — add AS SELECT " +
            "to bootstrap one"))
    }
    GraftCatalog.create(spark, name, loc)
    Seq(v).toDF("version")
  }

  /** The name→path pre-pass: rewrite every REGISTERED `db.table` token
    * to its bound manifest path — quoted (the existing path grammar
    * takes over) in verb positions and before a time-travel suffix; as
    * a fresh temp view over the latest snapshot after FROM/JOIN/USING,
    * where a bare quoted path would read as a string literal. Tokens
    * inside string literals and names the catalog doesn't know (column
    * refs like `s.flag`, foreign tables) pass through verbatim — the
    * catalog lookup is the disambiguator, so plain Spark SQL over
    * metastore tables is never disturbed.
    */
  private def resolveNames(spark: SparkSession, statement: String,
      views: scala.collection.mutable.Buffer[String]): String = {
    val matches = QualifiedNameRe.findAllMatchIn(statement).toSeq
    if (matches.isEmpty) return statement
    val sb = new StringBuilder
    var last = 0
    // in-string tracking covers BOTH quote styles: Spark's default parser
    // reads double-quoted text as a string literal too, so a registered
    // db.table token inside "..." must pass through verbatim exactly like
    // one inside '...'. Two independent states — a quote char inside the
    // OTHER style's literal is literal text, not a toggle.
    var inSingle = false
    var inDouble = false
    matches.foreach { m =>
      statement.substring(last, m.start).foreach {
        case '\'' if !inDouble => inSingle = !inSingle
        case '"' if !inSingle => inDouble = !inDouble
        case _ => ()
      }
      val inString = inSingle || inDouble
      val resolved =
        if (inString) None else GraftCatalog.resolve(spark, m.matched)
      sb.append(statement.substring(last, m.start))
      resolved match {
        case None => sb.append(m.matched)
        case Some(path) =>
          val rest = statement.substring(m.end)
          val beforeTT = TimeTravelSuffixRe.findFirstIn(rest).isDefined
          val prevTwo = PrevWordsRe
            .findFirstMatchIn(statement.substring(0, m.start))
          def up(s: String) =
            Option(s).map(_.toUpperCase(java.util.Locale.ROOT)).getOrElse("")
          val prevWord = prevTwo.map(m2 => up(m2.group(2))).getOrElse("")
          val prevPrev = prevTwo.map(m2 => up(m2.group(1))).getOrElse("")
          // statements whose FROM takes a TABLE OPERAND, not a read ref:
          // DELETE FROM t, REFRESH ROLLUP r FROM b, CONVERT ... FROM dir
          val head = """(?s)^\s*(\w+)""".r
            .findFirstMatchIn(statement).map(m2 => up(m2.group(1)))
            .getOrElse("")
          val readPosition = Set("FROM", "JOIN", "USING")(prevWord) &&
            !(prevWord == "FROM" &&
              (prevPrev == "DELETE" || head == "REFRESH" ||
                head == "CONVERT"))
          if (beforeTT || !readPosition)
            sb.append(s"'$path'")
          else {
            // PER-STATEMENT unique view, dropped by the caller once
            // the statement is analyzed: collision-free by construction
            // (the previous 32-bit path hash could alias two registered
            // tables onto one view) and immune to a concurrent
            // statement swapping the snapshot under this one's analysis
            // (latest-snapshot views are mutable content; a shared
            // deterministic slot raced).
            val view = freshView("graft_named_")
            VersionedTable.readLatest(spark, path)
              .createOrReplaceTempView(view)
            views += view
            sb.append(view)
          }
      }
      last = m.end
    }
    sb.append(statement.substring(last))
    sb.toString
  }

  /** Split on commas NOT nested inside parentheses — `SET a = f(x, y),
    * b = 2` has exactly one top-level comma.
    */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    // quote tracking mirrors resolveNames': a comma (or paren) inside a
    // string literal is literal text — `SET status = 'R,X'` is ONE
    // assignment. Both quote styles, each inert inside the other.
    var inSingle = false
    var inDouble = false
    s.indices.foreach { i =>
      s(i) match {
        case '\'' if !inDouble => inSingle = !inSingle
        case '"' if !inSingle => inDouble = !inDouble
        case _ if inSingle || inDouble => ()
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ => ()
      }
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def merge(spark: SparkSession, table: String, sourceSql: String,
      alias: Option[String], on: String, whens: String,
      views: scala.collection.mutable.Buffer[String]): DataFrame = {
    val key = on match {
      case OnEqRe(_, l, _, r) =>
        if (l.equalsIgnoreCase(r)) l
        else fail(s"ON must equate the SAME column name on both sides " +
          s"(got $l = $r) — the merge key identifies the row")
      case OnBareRe(k) => k
      case other => fail(s"unsupported ON clause '$other' — use a single " +
        "equi-key: ON k, or ON t.k = s.k")
    }
    val clauses = WhenRe.findAllMatchIn(whens).toSeq
    val parsed = clauses.map { m =>
      val notMatched = m.group(1) != null
      val cond = Option(m.group(2))
      val raw = m.group(3).trim
      val action = raw.toUpperCase.replaceAll("\\s+", " ")
      (notMatched, cond, action, raw)
    }
    // the WHEN grammar must consume the entire clause text — leftover
    // tokens mean an unsupported spelling, which must fail loudly rather
    // than silently drop an action
    val residue = WhenRe.replaceAllIn(whens, "").trim
    if (clauses.isEmpty || residue.nonEmpty)
      fail(s"unparseable WHEN clause near '${if (residue.nonEmpty) residue
        else whens}' — supported: WHEN MATCHED [AND cond] THEN DELETE, " +
        "WHEN MATCHED THEN UPDATE SET * | SET c = expr[, ...], " +
        "WHEN NOT MATCHED THEN INSERT *")
    val deletes = parsed.filter(_._3 == "DELETE")
    val updates = parsed.filter(_._3 == "UPDATE SET *")
    val inserts = parsed.filter(_._3 == "INSERT *")
    // PARTIAL-COLUMN update: `WHEN MATCHED THEN UPDATE SET c = expr, ...`
    // compiles to [[VersionedTable.mergeUpdate]] — matched rows
    // re-evaluate only the named columns (expressions see the old row as
    // `t` and the source row as `s`), unmentioned columns survive
    // verbatim, unmatched source keys are ignored. It stands ALONE: a
    // partial row has nothing to INSERT, and mixing with DELETE would
    // hide which clause consumed a row — fail loudly instead.
    val setUpdates = parsed.filter(c =>
      c._3.startsWith("UPDATE SET ") && c._3 != "UPDATE SET *")
    if (deletes.exists(_._1)) fail("WHEN NOT MATCHED THEN DELETE is not a " +
      "merge action (an unmatched key has nothing to delete)")
    if (updates.exists(c => c._1 || c._2.nonEmpty))
      fail("UPDATE SET * must be the plain WHEN MATCHED clause")
    if (inserts.exists(c => !c._1 || c._2.nonEmpty))
      fail("INSERT * must be the plain WHEN NOT MATCHED clause")
    if (setUpdates.nonEmpty &&
        (setUpdates.size > 1 || deletes.nonEmpty || updates.nonEmpty ||
          inserts.nonEmpty))
      fail("UPDATE SET <assignments> stands alone — one WHEN MATCHED " +
        "clause, no DELETE/INSERT/SET * alongside (a partial row has " +
        "nothing to insert)")
    if (setUpdates.isEmpty && updates.nonEmpty != inserts.nonEmpty)
      fail("upsert merges need BOTH 'WHEN MATCHED THEN UPDATE SET *' AND " +
        "'WHEN NOT MATCHED THEN INSERT *' — the verb replaces or inserts " +
        "the full source row")
    if (deletes.size > 1 || updates.size > 1 || inserts.size > 1)
      fail("duplicate WHEN clauses")
    val unconditionalDelete = deletes.exists(_._2.isEmpty)
    if (unconditionalDelete && updates.nonEmpty)
      fail("an unconditional WHEN MATCHED THEN DELETE cannot combine with " +
        "upsert clauses: the delete predicate evaluates on the source row " +
        "(not matched-ness), so every source row would delete; give the " +
        "DELETE an AND condition, or drop the UPDATE/INSERT clauses")
    if (setUpdates.nonEmpty) {
      if (setUpdates.exists(_._1))
        fail("UPDATE SET <assignments> needs WHEN MATCHED (an unmatched " +
          "key has nothing to update)")
    } else if (deletes.isEmpty && updates.isEmpty)
      fail("no actionable clause (need an upsert pair and/or a DELETE)")

    // alias the source so alias-qualified references in the DELETE
    // condition resolve (`s.flag` and bare `flag` both work); a subquery
    // source may itself time-travel (`USING (SELECT ... FROM '<path>'
    // VERSION AS OF n)`) — rewrite before handing it to spark.sql
    val raw =
      if (sourceSql.startsWith("("))
        spark.sql(rewriteTimeTravel(spark,
          sourceSql.stripPrefix("(").stripSuffix(")"), views))
      else spark.table(sourceSql)
    val src = alias.map(raw.as(_)).getOrElse(raw)
    import spark.implicits._
    if (setUpdates.nonEmpty) {
      val assigns = splitTopLevel(setUpdates.head._4
          .replaceFirst("(?is)^UPDATE\\s+SET\\s+", "")).map {
        case AssignRe(c, e) => c -> expr(e)
        case a => fail(s"unparseable SET assignment '$a' — use col = expr")
      }.toMap
      // the verb aliases the TARGET as `t` and the SOURCE as `s` for
      // the assignment (and AND-condition) expressions, regardless of
      // any USING alias; `WHEN MATCHED AND cond` gates which matched
      // pairs update — the rest survive verbatim
      val v = VersionedTable.mergeUpdate(spark, table, src, key, assigns,
        updateWhen = setUpdates.head._2.map(expr).getOrElse(lit(true)))
      return Seq(v).toDF("version")
    }
    val deleteWhen = deletes.headOption match {
      case Some((_, Some(cond), _, _)) => expr(cond)
      case Some((_, None, _, _)) => lit(true) // pure delete-merge
      case None => lit(false)
    }
    val v = VersionedTable.mergeInto(spark, table, src, key, deleteWhen)
    Seq(v).toDF("version")
  }

  /** Swap every `'<path>' VERSION AS OF n` reference for a temp view
    * over the committed snapshot; the rest of the statement is untouched
    * (plain Spark SQL — filters/joins/aggregates all apply to the
    * time-travel read, and pushdown works because the view IS the
    * snapshot's parquet scan). View names are per-statement unique and
    * appended to `views` for the caller to drop once the statement is
    * analyzed (see [[sql]]).
    */
  private def rewriteTimeTravel(spark: SparkSession, statement: String,
      views: scala.collection.mutable.Buffer[String]): String = {
    def register(df: DataFrame, prefix: String): String = {
      val view = freshView(prefix)
      df.createOrReplaceTempView(view)
      views += view
      view
    }
    val pinned = VersionRefRe.replaceAllIn(statement, m => {
      val table = Option(m.group(1)).getOrElse(m.group(2))
      register(VersionedTable.readVersion(spark, table, m.group(3).toLong),
        "graft_time_travel_")
    })
    val stamped = TimestampRefRe.replaceAllIn(pinned, m => {
      val table = Option(m.group(1)).getOrElse(m.group(2))
      // accept `YYYY-MM-DD HH:MM:SS[.fff]` or a bare date; interpreted
      // in the session's local clock, matching the writer-side
      // System.currentTimeMillis the manifests record
      val raw = m.group(3).trim
      val ts = java.sql.Timestamp.valueOf(
        if (raw.contains(" ") || raw.contains("T"))
          raw.replace("T", " ")
        else s"$raw 00:00:00")
      register(VersionedTable.readAsOf(spark, table, ts.getTime),
        "graft_as_of_")
    })
    LatestRefRe.replaceAllIn(stamped, m => {
      val table = Option(m.group(1)).getOrElse(m.group(2))
      register(VersionedTable.readLatest(spark, table), "graft_latest_")
    })
  }
}

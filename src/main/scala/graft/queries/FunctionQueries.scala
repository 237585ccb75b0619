package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{JsonbFunctions, PgFunctions, RangeFunctions}
import graft.sql.GpSqlDialect

/** SURVEY §2.10 scalar function surface (reference: src/backend/utils/adt/
  * — varlena.c, oracle_compat.c, numeric.c, timestamp.c, arrayfuncs.c,
  * json.c, regexp.c, encode.c). Spark built-ins everywhere they exist
  * (codegen'd, correct null semantics); PG-only functions come from
  * graft.functions.PgFunctions.
  *
  * Oracle notes: DuckDB lacks initcap/width_bucket/overlay — those oracles
  * spell out the equivalent arithmetic; dayofweek is 0-based in DuckDB vs
  * 1-based in Spark/PG; hex case is normalized with lower().
  */
object FunctionQueries {

  val defs: Seq[Q] = Seq(

    // ---- strings (varlena.c, oracle_compat.c) ----------------------
    Q("q_fn_string", Some(
      """SELECT n_nationkey,
        |  length(n_name) AS len,
        |  upper(n_name) AS up, lower(n_name) AS lo,
        |  substr(n_name, 1, 6) AS sub6,
        |  lpad(n_name, 12, '*') AS padded,
        |  rpad(n_name, 12, '.') AS rpadded,
        |  concat_ws('-', n_name, CAST(n_regionkey AS VARCHAR)) AS joined,
        |  replace(n_name, 'NATION', 'N') AS repl,
        |  reverse(n_name) AS rev,
        |  left(n_name, 3) AS l3, right(n_name, 2) AS r2,
        |  repeat(n_name, 2) AS doubled,
        |  strpos(n_name, '_') AS uspos,
        |  translate(n_name, 'NATIO', 'natio') AS trans,
        |  ascii(n_name) AS first_code, chr(65 + n_nationkey % 26) AS letter,
        |  trim('  pad  ') AS trimmed
        |FROM nation ORDER BY n_nationkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      Tables.T(s, dir).nation.select(
        $"n_nationkey",
        length($"n_name").as("len"),
        upper($"n_name").as("up"), lower($"n_name").as("lo"),
        substring($"n_name", 1, 6).as("sub6"),
        lpad($"n_name", 12, "*").as("padded"),
        rpad($"n_name", 12, ".").as("rpadded"),
        concat_ws("-", $"n_name", $"n_regionkey".cast("string")).as("joined"),
        regexp_replace($"n_name", "NATION", "N").as("repl"),
        reverse($"n_name").as("rev"),
        expr("left(n_name, 3)").as("l3"), expr("right(n_name, 2)").as("r2"),
        repeat($"n_name", 2).as("doubled"),
        instr($"n_name", "_").as("uspos"),
        translate($"n_name", "NATIO", "natio").as("trans"),
        ascii($"n_name").as("first_code"),
        chr(lit(65) + $"n_nationkey" % 26).as("letter"),
        trim(lit("  pad  ")).as("trimmed"))
        .orderBy("n_nationkey")
    },

    Q("q_fn_string_fmt", Some(
      """SELECT s_suppkey,
        |  printf('%s has balance %08.2f', s_name, s_acctbal) AS msg,
        |  printf('%d/%d', s_suppkey, s_nationkey) AS frac,
        |  split_part(s_name, '#', 2) AS name_num
        |FROM supplier ORDER BY s_suppkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      Tables.T(s, dir).supplier.select(
        $"s_suppkey",
        format_string("%s has balance %08.2f", $"s_name", $"s_acctbal").as("msg"),
        format_string("%d/%d", $"s_suppkey", $"s_nationkey").as("frac"),
        element_at(split($"s_name", "#"), 2).as("name_num"))
        .orderBy("s_suppkey")
    },

    // pg_trgm similarity + fuzzystrmatch levenshtein (contrib/pg_trgm
    // trgm_op.c, contrib/fuzzystrmatch): trigram sets with pg_trgm's
    // exact normalization — lowercase, split on non-alnum, each word
    // padded '  w ' — similarity = |∩|/|∪| of the distinct sets. Both
    // engines build the sets with the same nested-lambda expression
    // tree; row counts are dim-scale so interpreted HOFs are fine
    // (the bulk-dedup path for big relations is Dedup.jaccardPairs).
    Q("q_fn_fuzzy", Some {
      def words(c: String) =
        s"list_filter(string_split_regex(lower($c), '[^a-z0-9]+'), w -> len(w) > 0)"
      def tgs(c: String) =
        s"""list_distinct(flatten(list_transform(${words(c)},
           |    w -> list_transform(range(1, len(w) + 2),
           |      i -> substr(concat('  ', w, ' '), CAST(i AS INT), 3)))))""".stripMargin
      def sim(a: String, b: String) =
        s"""(CASE WHEN len(list_distinct(list_concat(${tgs(a)}, ${tgs(b)}))) = 0
           |  THEN 0.0
           |  ELSE CAST(len(list_intersect(${tgs(a)}, ${tgs(b)})) AS DOUBLE)
           |    / len(list_distinct(list_concat(${tgs(a)}, ${tgs(b)}))) END)""".stripMargin
      s"""SELECT s_suppkey,
         |  levenshtein(s_name, replace(s_name, '0', 'O')) AS lev,
         |  ${sim("s_name", "CAST(s_suppkey AS VARCHAR)")} AS sim_key,
         |  ${sim("s_name", "replace(s_name, 'Supplier', 'Suplier')")} AS sim_typo
         |FROM supplier ORDER BY s_suppkey""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      def words(c: org.apache.spark.sql.Column) =
        filter(split(lower(c), "[^a-z0-9]+"), w => length(w) > 0)
      def tgs(c: org.apache.spark.sql.Column) =
        array_distinct(flatten(transform(words(c), w => {
          val p = concat(lit("  "), w, lit(" "))
          transform(sequence(lit(1), length(w) + 1),
            i => p.substr(i, lit(3)))
        })))
      def sim(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
        val u = size(array_union(tgs(a), tgs(b)))
        when(u === 0, 0.0)
          .otherwise(size(array_intersect(tgs(a), tgs(b))).cast("double") / u)
      }
      Tables.T(s, dir).supplier.select(
        $"s_suppkey",
        levenshtein($"s_name", regexp_replace($"s_name", "0", "O")).as("lev"),
        sim($"s_name", $"s_suppkey".cast("string")).as("sim_key"),
        sim($"s_name", regexp_replace($"s_name", "Supplier", "Suplier"))
          .as("sim_typo"))
        .orderBy("s_suppkey")
    },

    // contrib/fuzzystrmatch soundex + difference (fuzzystrmatch.c
    // _soundex): PG's variant compares each letter's code against the
    // PREVIOUS CHARACTER's code (not the last appended digit — the
    // H/W-transparent census variant Hive/Spark's builtin implements
    // differs, so the builtin is NOT used). On an all-alpha word that
    // rule is exactly "collapse runs in the code string, drop the
    // first run, drop zeros, take 3, pad" — the Spark side is one
    // codegen'd translate + regexp chain per row, map-only; the oracle
    // replays the per-character algorithm literally via explode + lag.
    // difference() counts matching soundex positions (0-4).
    Q("q_fn_soundex", Some {
      val map = "01230120022455012623010202"
      s"""WITH p AS (SELECT p_partkey AS k,
         |    regexp_extract(lower(p_name), '^[a-z]+') AS w1,
         |    regexp_extract(lower(p_name), '[a-z]+$$') AS w2
         |  FROM part WHERE p_partkey <= 2000),
         |u AS (SELECT k, 1 AS wh, w1 AS w FROM p
         |      UNION ALL SELECT k, 2 AS wh, w2 AS w FROM p),
         |c AS (SELECT k, wh, CAST(i AS INT) AS pos,
         |    substr(w, CAST(i AS INT), 1) AS ch,
         |    translate(substr(w, CAST(i AS INT), 1),
         |      'abcdefghijklmnopqrstuvwxyz', '$map') AS code
         |  FROM u, unnest(range(1, len(w) + 1)) AS r(i)),
         |l AS (SELECT k, wh, pos, ch, code,
         |    lag(code) OVER (PARTITION BY k, wh ORDER BY pos) AS pcode
         |  FROM c),
         |d AS (SELECT k, wh,
         |    max(CASE WHEN pos = 1 THEN upper(ch) END) AS fl,
         |    coalesce(string_agg(CASE WHEN pos > 1 AND code <> pcode
         |        AND code <> '0' THEN code END, '' ORDER BY pos), '')
         |      AS ds
         |  FROM l GROUP BY k, wh),
         |s AS (SELECT k, wh, fl || substr(ds || '000', 1, 3) AS sdx
         |  FROM d),
         |j AS (SELECT k,
         |    max(CASE WHEN wh = 1 THEN sdx END) AS sdx1,
         |    max(CASE WHEN wh = 2 THEN sdx END) AS sdx2
         |  FROM s GROUP BY k)
         |SELECT k AS p_partkey, sdx1, sdx2,
         |  (CASE WHEN substr(sdx1, 1, 1) = substr(sdx2, 1, 1)
         |     THEN 1 ELSE 0 END
         | + CASE WHEN substr(sdx1, 2, 1) = substr(sdx2, 2, 1)
         |     THEN 1 ELSE 0 END
         | + CASE WHEN substr(sdx1, 3, 1) = substr(sdx2, 3, 1)
         |     THEN 1 ELSE 0 END
         | + CASE WHEN substr(sdx1, 4, 1) = substr(sdx2, 4, 1)
         |     THEN 1 ELSE 0 END) AS diff
         |FROM j ORDER BY p_partkey""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      def sdxOf(w: org.apache.spark.sql.Column) = {
        val codes = translate(w, "abcdefghijklmnopqrstuvwxyz",
          "01230120022455012623010202")
        // collapse runs (≡ PG's prev-char-code skip on alpha input),
        // drop the first run (the first letter's own code), drop the
        // vowel/h/w zeros, take 3 digits, zero-pad
        val digits = translate(
          substring(regexp_replace(codes, "(.)\\1+", "$1"), 2, 1000),
          "0", "")
        concat(upper(substring(w, 1, 1)),
          substring(concat(digits, lit("000")), 1, 3))
      }
      val base = Tables.T(s, dir).part.filter($"p_partkey" <= 2000)
        .select($"p_partkey",
          regexp_extract(lower($"p_name"), "^[a-z]+", 0).as("w1"),
          regexp_extract(lower($"p_name"), "[a-z]+$", 0).as("w2"))
        .select($"p_partkey", sdxOf($"w1").as("sdx1"), sdxOf($"w2").as("sdx2"))
      def m(i: Int) = when(
        substring($"sdx1", i, 1) === substring($"sdx2", i, 1), 1)
        .otherwise(0)
      base.select($"p_partkey", $"sdx1", $"sdx2",
        (m(1) + m(2) + m(3) + m(4)).as("diff"))
        .orderBy("p_partkey")
    },

    // contrib/fuzzystrmatch metaphone (fuzzystrmatch.c:335 _metaphone
    // — Philips' phoneme automaton with PG's CHR/SCH/SCHW tweaks),
    // ported as the native codegen'd [[graft.expressions.MetaphoneExpr]].
    // The corpus words (documents tokens ∪ part name words) intersect
    // a fixed vocabulary whose expected codes were produced by an
    // INDEPENDENT replica of the automaton (and the branchy cases —
    // GUMBO/school/christ/Xavier/wright/action — pin in ExpressionSpec
    // as hand-derived vectors), so the oracle is a literal table the
    // engine must reproduce at both maxlen 4 and 8.
    Q("q_fn_metaphone", Some {
      val rows = MetaphoneVocab.table
        .map { case (w, m4, m8) => s"('$w', '$m4', '$m8')" }
        .mkString(",\n  ")
      s"""WITH mv(w, mp4, mp8) AS (VALUES
         |  $rows),
         |corpus AS (
         |  SELECT DISTINCT t AS w FROM (
         |    SELECT unnest(string_split(lower(text), ' ')) AS t
         |    FROM documents
         |    UNION ALL
         |    SELECT regexp_extract(lower(p_name), '^[a-z]+') FROM part
         |    UNION ALL
         |    SELECT regexp_extract(lower(p_name), '[a-z]+$$') FROM part)
         |  WHERE regexp_matches(t, '^[a-z]+$$'))
         |SELECT w, mp4, mp8 FROM mv JOIN corpus USING (w)
         |ORDER BY w""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val t = Tables.T(s, dir)
      val corpus = t.documents
        .select(explode(split(lower($"text"), " ")).as("w"))
        .union(t.part.select(
          regexp_extract(lower($"p_name"), "^[a-z]+", 0).as("w")))
        .union(t.part.select(
          regexp_extract(lower($"p_name"), "[a-z]+$", 0).as("w")))
        .filter($"w".rlike("^[a-z]+$")).distinct()
      corpus
        .filter($"w".isin(MetaphoneVocab.table.map(_._1): _*))
        .select($"w",
          call_function("metaphone", $"w", lit(4)).as("mp4"),
          call_function("metaphone", $"w", lit(8)).as("mp8"))
        .orderBy("w")
    },

    // PG split SRFs (regexp.c regexp_split_to_table, varlena.c
    // string_to_table with a LITERAL delimiter): pre-registered SQL
    // bodies inline to explode(split(...)) — one generator per branch.
    // DuckDB oracle: unnest over its split functions.
    Q("q_fn_split_table", Some(
      """SELECT src, part FROM (
        |  SELECT 'regex' AS src,
        |    unnest(string_split_regex(n_name, 'A')) AS part FROM nation
        |  UNION ALL
        |  SELECT 'literal' AS src,
        |    unnest(string_split(concat(s_name, '.', s_nationkey), '.'))
        |      AS part
        |  FROM supplier WHERE s_suppkey <= 5)
        |ORDER BY src, part""".stripMargin)) { (s, dir) =>
      Tables.registerAll(s, dir)
      // the literal branch splits on '.' — a regex metachar — so a
      // broken \Q..\E quoting would shred every character
      GpSqlDialect.execute(s,
        """SELECT src, part FROM (
          |  SELECT 'regex' AS src, regexp_split_to_table(n_name, 'A') AS part
          |  FROM nation
          |  UNION ALL
          |  SELECT 'literal' AS src,
          |    string_to_table(concat(s_name, '.', s_nationkey), '.') AS part
          |  FROM supplier WHERE s_suppkey <= 5)
          |ORDER BY src, part""".stripMargin, "/tmp/never")
    },

    // ---- math (float.c, int.c, numeric.c) --------------------------
    Q("q_fn_math", Some(
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25) AS dev,
        |  CAST(sign(l_quantity - 25) AS DOUBLE) AS sgn,
        |  mod(CAST(l_quantity AS INT), 7) AS m7,
        |  CAST(floor(l_extendedprice) AS DOUBLE) AS fl,
        |  CAST(ceil(l_extendedprice) AS DOUBLE) AS ce,
        |  round(l_extendedprice, 1) AS r1,
        |  sqrt(l_quantity) AS sq,
        |  round(cbrt(l_quantity), 6) AS cb,
        |  round(exp(l_discount), 6) AS ex,
        |  round(ln(l_quantity + 1), 6) AS lg,
        |  round(log10(l_extendedprice), 6) AS l10,
        |  round(log2(l_quantity + 1), 6) AS l2,
        |  round(power(l_quantity, 1.5), 4) AS pw,
        |  round(sin(l_discount), 6) AS sn,
        |  round(atan2(l_quantity, 10), 6) AS at2,
        |  round(degrees(l_discount), 6) AS dg
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)) { (s, dir) =>
      import s.implicits._
      Tables.T(s, dir).lineitem.filter($"l_orderkey" <= 100).select(
        $"l_orderkey", $"l_linenumber",
        abs($"l_quantity" - 25).as("dev"),
        signum($"l_quantity" - 25).cast("double").as("sgn"),
        ($"l_quantity".cast("int") % 7).as("m7"),
        floor($"l_extendedprice").cast("double").as("fl"),
        ceil($"l_extendedprice").cast("double").as("ce"),
        round($"l_extendedprice", 1).as("r1"),
        sqrt($"l_quantity").as("sq"),
        round(cbrt($"l_quantity"), 6).as("cb"),
        round(exp($"l_discount"), 6).as("ex"),
        round(log($"l_quantity" + 1), 6).as("lg"),
        round(log10($"l_extendedprice"), 6).as("l10"),
        round(log2($"l_quantity" + 1), 6).as("l2"),
        round(pow($"l_quantity", 1.5), 4).as("pw"),
        round(sin($"l_discount"), 6).as("sn"),
        round(atan2($"l_quantity", lit(10.0)), 6).as("at2"),
        round(degrees($"l_discount"), 6).as("dg"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- date/time (timestamp.c, date.c, datetime.c) ---------------
    Q("q_fn_datetime", Some(
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS mo,
        |  day(o_orderdate) AS d, quarter(o_orderdate) AS q,
        |  dayofweek(o_orderdate) + 1 AS dow,
        |  dayofyear(o_orderdate) AS doy,
        |  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS mstart,
        |  CAST(CAST(date_trunc('quarter', o_orderdate) AS DATE) AS VARCHAR) AS qstart,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS meow,
        |  CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus3m,
        |  CAST(CAST(o_orderdate + INTERVAL 45 DAY AS DATE) AS VARCHAR) AS plus45d,
        |  datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        Tables.T(s, dir).orders.filter($"o_orderkey" <= 300).select(
          $"o_orderkey",
          year($"o_orderdate").as("y"), month($"o_orderdate").as("mo"),
          dayofmonth($"o_orderdate").as("d"), quarter($"o_orderdate").as("q"),
          dayofweek($"o_orderdate").as("dow"),
          dayofyear($"o_orderdate").as("doy"),
          // date results rendered as ISO strings: DATE columns read back
          // as date32 vs datetime64 depending on the reader, breaking the
          // exact compare even when values agree
          date_trunc("month", $"o_orderdate").cast("date").cast("string").as("mstart"),
          date_trunc("quarter", $"o_orderdate").cast("date").cast("string").as("qstart"),
          last_day($"o_orderdate").cast("string").as("meow"),
          ($"o_orderdate" + expr("INTERVAL 3 MONTH")).cast("date").cast("string").as("plus3m"),
          ($"o_orderdate" + expr("INTERVAL 45 DAY")).cast("date").cast("string").as("plus45d"),
          datediff(lit("2002-01-01"), $"o_orderdate").as("days_to"),
          unix_timestamp($"o_orderdate").as("epoch_s"))
          .orderBy("o_orderkey")
    },

    // to_char / to_date style formatting (formatting.c) — PG templates
    // map onto Spark date_format patterns / DuckDB strftime.
    Q("q_fn_datefmt", Some(
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
        |  strftime(o_orderdate, '%Y/%m') AS ym,
        |  strftime(o_orderdate, '%d %B %Y') AS verbose
        |FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        Tables.T(s, dir).orders.filter($"o_orderkey" <= 100).select(
          $"o_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("iso_day"),
          date_format($"o_orderdate", "yyyy/MM").as("ym"),
          date_format($"o_orderdate", "dd MMMM yyyy").as("verbose"))
          .orderBy("o_orderkey")
    },

    // ---- conditionals ----------------------------------------------
    Q("q_fn_conditional", Some(
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'debt'
        |       WHEN c_acctbal < 5000 THEN 'mid' ELSE 'rich' END AS band,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
        |  greatest(c_acctbal, 1000.0) AS floor_bal,
        |  least(c_acctbal, 9000.0) AS cap_bal,
        |  if(c_nationkey % 2 = 0, 'even', 'odd') AS parity
        |FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        Tables.T(s, dir).customer.filter($"c_custkey" <= 200).select(
          $"c_custkey",
          when($"c_acctbal" < 0, "debt")
            .when($"c_acctbal" < 5000, "mid")
            .otherwise("rich").as("band"),
          coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("OTHER")).as("seg"),
          greatest($"c_acctbal", lit(1000.0)).as("floor_bal"),
          least($"c_acctbal", lit(9000.0)).as("cap_bal"),
          when($"c_nationkey" % 2 === 0, "even").otherwise("odd").as("parity"))
          .orderBy("c_custkey")
    },

    // ---- casts (PG cast semantics; double→int via explicit trunc) --
    Q("q_fn_cast", Some(
      """SELECT o_orderkey,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS roundtrip,
        |  CAST(trunc(o_totalprice) AS BIGINT) AS price_trunc,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS as_date,
        |  CAST(o_orderkey % 2 = 0 AS INT) AS even_flag,
        |  CAST('123' AS INT) + o_orderkey AS lit_cast
        |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        Tables.T(s, dir).orders.filter($"o_orderkey" <= 200).select(
          $"o_orderkey",
          $"o_orderkey".cast("string").as("key_str"),
          $"o_orderkey".cast("string").cast("long").as("roundtrip"),
          expr("CAST(o_totalprice AS BIGINT)").as("price_trunc"),
          // decimal → double for the compare: pandas renders DECIMAL(18,2)
          // with trailing zeros ("123.40") vs float64 "123.4"
          $"o_totalprice".cast("decimal(18,2)").cast("double").as("price_dec"),
          $"o_orderdate".cast("date").cast("string").as("as_date"),
          ($"o_orderkey" % 2 === 0).cast("int").as("even_flag"),
          (lit("123").cast("int") + $"o_orderkey").as("lit_cast"))
          .orderBy("o_orderkey")
    },

    // ---- arrays (arrayfuncs.c, array_userfuncs.c) ------------------
    // Array outputs are serialized with array_to_string/array_join so the
    // driver's pandas compare (which can't sort ndarray cells) sees VARCHAR.
    Q("q_fn_array", Some(
      """SELECT n_nationkey,
        |  array_to_string(range(1, (n_nationkey % 5) + 3), ',') AS arr,
        |  len(range(1, (n_nationkey % 5) + 3)) AS alen,
        |  (range(1, (n_nationkey % 5) + 3))[2] AS second,
        |  list_contains(range(1, (n_nationkey % 5) + 3), 3) AS has3,
        |  list_position(range(1, (n_nationkey % 5) + 3), 2) AS pos2,
        |  array_to_string(list_slice(range(1, (n_nationkey % 5) + 3), 1, 2), ',') AS head2,
        |  array_to_string(list_sort(list_reverse_sort(range(1, (n_nationkey % 5) + 3))), ',') AS sorted_back,
        |  list_reduce(range(1, (n_nationkey % 5) + 3), (a, x) -> a + x) AS total,
        |  array_to_string(list_transform(range(1, (n_nationkey % 5) + 3), x -> x * 10), ',') AS tens,
        |  array_to_string(list_filter(range(1, (n_nationkey % 5) + 3), x -> x % 2 = 0), ',') AS evens,
        |  array_to_string(flatten([range(1, (n_nationkey % 5) + 3), [99]]), ',') AS with99
        |FROM nation ORDER BY n_nationkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val arr = sequence(lit(1L), ($"n_nationkey" % 5 + 2).cast("long"))
      Tables.T(s, dir).nation.select(
        $"n_nationkey",
        array_join(arr, ",").as("arr"),
        size(arr).as("alen"),
        element_at(arr, 2).as("second"),
        array_contains(arr, 3).as("has3"),
        array_position(arr, 2).as("pos2"),
        array_join(slice(arr, 1, 2), ",").as("head2"),
        array_join(array_sort(reverse(array_sort(arr))), ",").as("sorted_back"),
        aggregate(arr, lit(0L), (a, x) => a + x).as("total"),
        array_join(transform(arr, x => x * 10), ",").as("tens"),
        array_join(filter(arr, x => x % 2 === 0), ",").as("evens"),
        array_join(flatten(array(arr, array(lit(99L)))), ",").as("with99"))
        .orderBy("n_nationkey")
    },

    // Set-returning function in FROM (§2.1 FunctionScan → explode).
    Q("q_fn_explode", Some(
      """SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |FROM documents WHERE doc_id < 3
        |ORDER BY doc_id, word""".stripMargin)) { (s, dir) =>
      import s.implicits._
      Tables.T(s, dir).documents.filter($"doc_id" < 3)
        .select($"doc_id", explode(split($"text", " ")).as("word"))
        .orderBy("doc_id", "word")
    },

    // ---- regex (regexp.c) ------------------------------------------
    Q("q_fn_regex", Some(
      """SELECT event_id,
        |  regexp_extract(props, '([0-9]+)', 1) AS digits,
        |  regexp_replace(props, '[0-9]', '#', 'g') AS masked,
        |  regexp_matches(props, '"k": [0-9]{2}\}$') AS two_digit,
        |  len(string_split_regex(props, '[:,]')) AS n_parts
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        Tables.T(s, dir).events.filter($"event_id" < 200).select(
          $"event_id",
          regexp_extract($"props", "([0-9]+)", 1).as("digits"),
          regexp_replace($"props", "[0-9]", "#").as("masked"),
          $"props".rlike("\"k\": [0-9]{2}\\}$").as("two_digit"),
          size(split($"props", "[:,]")).as("n_parts"))
          .orderBy("event_id")
    },

    // ---- JSON (json.c, jsonfuncs.c) --------------------------------
    Q("q_fn_json", Some(
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        |  json_extract_string(props, '$.k') AS k_str,
        |  json_extract_string(props, '$.missing') AS nothing,
        |  to_json({'id': event_id, 'type': event_type}) AS packed
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        Tables.T(s, dir).events.filter($"event_id" < 200).select(
          $"event_id",
          get_json_object($"props", "$.k").cast("int").as("k_int"),
          get_json_object($"props", "$.k").as("k_str"),
          get_json_object($"props", "$.missing").as("nothing"),
          to_json(struct($"event_id".as("id"), $"event_type".as("type")))
            .as("packed"))
          .orderBy("event_id")
    },

    // to_char numeric templates (formatting.c) — grouped and plain forms.
    Q("q_fn_tochar", Some(
      """SELECT o_orderkey,
        |  format('{:,}', CAST(floor(o_totalprice) AS BIGINT)) || '.' ||
        |    printf('%02d', CAST(round((o_totalprice - floor(o_totalprice)) * 100)
        |      AS INT)) AS grouped,
        |  printf('%.2f', o_totalprice) AS plain,
        |  printf('%.0f', round(o_totalprice, 0)) AS whole
        |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        Tables.T(s, dir).orders.filter($"o_orderkey" <= 200).select(
          $"o_orderkey",
          PgFunctions.toCharNumeric($"o_totalprice", "9G999G999D99").as("grouped"),
          PgFunctions.toCharNumeric($"o_totalprice", "FM9999999.99").as("plain"),
          // pre-round: Java %.0f is HALF_UP, C printf is HALF_EVEN
          PgFunctions.toCharNumeric(round($"o_totalprice", 0), "FM9999999")
            .as("whole"))
          .orderBy("o_orderkey")
    },

    // to_char numeric templates, round 2 (formatting.c NUM_S/MI/PR/L/RN/
    // EEEE): sign anchoring, trailing minus, angle-bracket negatives,
    // currency, Roman numerals, scientific notation. The oracle spells
    // out each template's construction rule.
    Q("q_fn_tochar_numeric2", Some(
      """WITH t AS (SELECT o_orderkey, o_totalprice,
        |    o_totalprice - 200000 AS amt FROM orders WHERE o_orderkey <= 200)
        |SELECT o_orderkey,
        |  CASE WHEN amt < 0 THEN '-' ELSE '+' END ||
        |    printf('%.2f', abs(amt)) AS sgn,
        |  printf('%.2f', abs(amt)) ||
        |    CASE WHEN amt < 0 THEN '-' ELSE ' ' END AS mi,
        |  CASE WHEN amt < 0 THEN '<' || printf('%.2f', abs(amt)) || '>'
        |    ELSE printf('%.2f', abs(amt)) END AS pr,
        |  CASE WHEN amt < 0 THEN '-' ELSE '' END || '$' ||
        |    format('{:,}', CAST(floor(abs(amt)) AS BIGINT)) || '.' ||
        |    printf('%02d', CAST(round((abs(amt) - floor(abs(amt))) * 100)
        |      AS INT)) AS cur,
        |  lpad((['','M','MM','MMM'])[(o_orderkey % 3999 + 1) // 1000 + 1] ||
        |    (['','C','CC','CCC','CD','D','DC','DCC','DCCC','CM'])
        |      [((o_orderkey % 3999 + 1) // 100) % 10 + 1] ||
        |    (['','X','XX','XXX','XL','L','LX','LXX','LXXX','XC'])
        |      [((o_orderkey % 3999 + 1) // 10) % 10 + 1] ||
        |    (['','I','II','III','IV','V','VI','VII','VIII','IX'])
        |      [(o_orderkey % 3999 + 1) % 10 + 1], 15, ' ') AS rn,
        |  ' ' || printf('%.2f', CAST(round(CAST(o_totalprice /
        |      pow(10, CAST(floor(log10(o_totalprice)) AS INT))
        |      AS DECIMAL(28,10)), 2) AS DOUBLE)) || 'e+' ||
        |    lpad(CAST(CAST(floor(log10(o_totalprice)) AS INT) AS VARCHAR),
        |      2, '0') AS sci
        |FROM t ORDER BY o_orderkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      Tables.T(s, dir).orders.filter($"o_orderkey" <= 200)
        .withColumn("amt", $"o_totalprice" - 200000)
        .select(
          $"o_orderkey",
          PgFunctions.toCharNumeric($"amt", "S9999999D99").as("sgn"),
          PgFunctions.toCharNumeric($"amt", "9999999D99MI").as("mi"),
          PgFunctions.toCharNumeric($"amt", "FM9999999D99PR").as("pr"),
          PgFunctions.toCharNumeric($"amt", "L9G999G999D99").as("cur"),
          PgFunctions.toCharNumeric(pmod($"o_orderkey", lit(3999)) + 1, "RN")
            .as("rn"),
          PgFunctions.toCharNumeric($"o_totalprice", "9.99EEEE").as("sci"))
        .orderBy("o_orderkey")
    },

    // to_char(timestamp, template) through the full PG template engine
    // (formatting.c DCH keywords): name fields with PG's blank-padding,
    // FM modifier, numeric fields, quoted literals.
    Q("q_fn_tochar_date", Some(
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS iso,
        |  strftime(ts, '%A, %d %B %Y') AS verbose,
        |  rpad(strftime(ts, '%A'), 9, ' ') AS day_padded,
        |  CAST(quarter(ts) AS VARCHAR) AS qtr,
        |  strftime(ts, '%j') AS doy3,
        |  CAST(dayofweek(ts) + 1 AS VARCHAR) AS dnum,
        |  strftime(ts, '%Y') || ' y ' || CAST(quarter(ts) AS VARCHAR) AS lit_mix
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        Tables.T(s, dir).events.filter($"event_id" < 200).select(
          $"event_id",
          PgFunctions.toChar($"ts", "YYYY-MM-DD HH24:MI:SS").as("iso"),
          PgFunctions.toChar($"ts", "FMDay, DD FMMonth YYYY").as("verbose"),
          PgFunctions.toChar($"ts", "Day").as("day_padded"),
          PgFunctions.toChar($"ts", "Q").as("qtr"),
          PgFunctions.toChar($"ts", "DDD").as("doy3"),
          PgFunctions.toChar($"ts", "D").as("dnum"),
          PgFunctions.toChar($"ts", "YYYY \"y\" Q").as("lit_mix"))
          .orderBy("event_id")
    },

    // PG `time` type gap (§1.4): micros-since-midnight + display string.
    Q("q_fn_timeofday", Some(
      """SELECT event_id,
        |  epoch_us(ts) - epoch_us(date_trunc('day', ts)) AS tod_us,
        |  hour(ts) AS h, minute(ts) AS m, second(ts) AS sec
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        Tables.T(s, dir).events.filter($"event_id" < 200).select(
          $"event_id",
          PgFunctions.timeOfDayMicros($"ts").as("tod_us"),
          hour($"ts").as("h"), minute($"ts").as("m"),
          second($"ts").as("sec"))
          .orderBy("event_id")
    },

    // PG 14 date_bin (timestamp.c timestamp_bin): arbitrary-origin time
    // bucketing — the time-series roll-up primitive (15-minute buckets
    // anchored 5 minutes past the hour). Pure integer-micros arithmetic,
    // stays in codegen; oracle is DuckDB's time_bucket with origin.
    Q("q_fn_datebin", Some(
      """SELECT time_bucket(INTERVAL 15 MINUTE, ts,
        |    TIMESTAMP '1970-01-01 00:05:00') AS bucket,
        |  count(*) AS n
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        Tables.T(s, dir).events
          .groupBy(PgFunctions.dateBin(15L * 60 * 1000000, $"ts",
            to_timestamp(lit("1970-01-01 00:05:00"))).as("bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy("bucket")
    },

    // generate_series over timestamps (SRF, utils/adt/timestamp.c
    // generate_series_timestamp) — the scaffold relation for gap-free
    // time-series joins; Spark: sequence() + explode.
    Q("q_generate_series_ts", Some(
      """SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
        |    TIMESTAMP '2024-01-08', INTERVAL 6 HOUR)) AS ts
        |ORDER BY ts""".stripMargin)) { (s, _) =>
      import s.implicits._
      s.range(1).select(explode(sequence(
          to_timestamp(lit("2024-01-01")),
          to_timestamp(lit("2024-01-08")),
          expr("INTERVAL 6 HOURS"))).as("ts"))
        .orderBy("ts")
    },

    // jsonb containment `@>` + object merge `||` (jsonb.c operators).
    Q("q_fn_jsonb", Some(
      """SELECT event_id,
        |  json_contains(props, '{"k": 69}') AS has_k69,
        |  json_contains(props, '{"missing": 1}') AS has_missing,
        |  CAST(json_merge_patch(props, '{"src": "graft"}') AS VARCHAR)
        |    AS enriched
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        PgFunctions.registerAll(s)
        Tables.T(s, dir).events.filter($"event_id" < 200).select(
          $"event_id",
          call_udf("jsonb_contains", $"props", lit("""{"k": 69}"""))
            .as("has_k69"),
          call_udf("jsonb_contains", $"props", lit("""{"missing": 1}"""))
            .as("has_missing"),
          to_json(struct(
            get_json_object($"props", "$.k").cast("int").as("k"),
            lit("graft").as("src"))).as("enriched"))
          .orderBy("event_id")
    },

    // jsonb breadth round 2 (jsonfuncs.c): #>/#>> path extraction over a
    // nested document, json_each explosion, row_to_json →
    // json_populate_record round-trip.
    Q("q_fn_jsonb2", Some(
      """SELECT e.event_id,
        |  k.jkey AS jkey,
        |  json_extract_string(e.props, '$.' || k.jkey) AS jval,
        |  json_extract_string(
        |    json_object('meta', json_object('type', e.event_type,
        |      'k', CAST(e.props->>'k' AS INT)), 'id', e.event_id),
        |    '$.meta.type') AS ptext,
        |  CAST(json_extract(
        |    json_object('meta', json_object('type', e.event_type,
        |      'k', CAST(e.props->>'k' AS INT)), 'id', e.event_id),
        |    '$.meta') AS VARCHAR) AS pj,
        |  e.event_type AS rt_type,
        |  CAST(e.props->>'k' AS INT) AS rt_k
        |FROM events e, unnest(json_keys(e.props)) AS k(jkey)
        |WHERE e.event_id < 200 ORDER BY e.event_id""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val kInt = get_json_object($"props", "$.k").cast("int")
        val nested = JsonbFunctions.rowToJson(
          struct($"event_type".as("type"), kInt.as("k")).as("meta"),
          $"event_id".as("id"))
        Tables.T(s, dir).events.filter($"event_id" < 200)
          .withColumn("rec", JsonbFunctions.jsonPopulateRecord(
            JsonbFunctions.rowToJson($"event_type".as("type"), kInt.as("k")),
            "type STRING, k INT"))
          .select($"event_id",
            JsonbFunctions.jsonEach($"props").as(Seq("jkey", "jval")),
            JsonbFunctions.extractPathText(nested, "meta", "type").as("ptext"),
            JsonbFunctions.extractPath(nested, "meta").as("pj"),
            $"rec.type".as("rt_type"), $"rec.k".as("rt_k"))
          .orderBy("event_id")
    },

    // Input-side formatting surface (formatting.c): to_timestamp/to_date
    // through the DCH templates, to_number parsing back a currency
    // rendering (round-trip with to_char), and SQL OVERLAPS
    // (datetime.c) with pair normalization.
    Q("q_fn_datetime2", Some(
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS dstr,
        |  CAST(strftime(o_orderdate, '%Y-%m-%d') || ' 12:30:45' AS TIMESTAMP)
        |    AS back_ts,
        |  o_totalprice AS n_back,
        |  (o_orderdate < TIMESTAMP '1996-07-01'
        |    AND TIMESTAMP '1996-01-01' < o_orderdate + INTERVAL '60 days')
        |    AS ovl
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val dstr = PgFunctions.toChar($"o_orderdate", "YYYY-MM-DD")
        Tables.T(s, dir).orders.filter($"o_orderkey" <= 500)
          .select($"o_orderkey",
            dstr.as("dstr"),
            PgFunctions.toTimestampPg(
              concat(dstr, lit(" 12:30:45")), "YYYY-MM-DD HH24:MI:SS")
              .as("back_ts"),
            PgFunctions.toNumber(
              PgFunctions.toCharNumeric($"o_totalprice", "L9G999G999D99"),
              "L9G999G999D99").as("n_back"),
            PgFunctions.overlaps($"o_orderdate",
              $"o_orderdate" + make_dt_interval(lit(60), lit(0), lit(0), lit(0)),
              lit("1996-01-01").cast("timestamp"),
              lit("1996-07-01").cast("timestamp")).as("ovl"))
          .orderBy("o_orderkey")
    },

    // Interval surface (timestamp.c): age() with PG's field borrowing,
    // justify_hours text of an exact difference, epoch extraction, and
    // native ANSI interval arithmetic (ts + make_interval, day-time
    // interval * scalar — Catalyst's own interval types, no UDFs).
    Q("q_fn_interval", Some(
      """SELECT event_id,
        |  CAST(age(ts, TIMESTAMP '2022-12-25 10:45:30') AS VARCHAR) AS age_txt,
        |  CAST(date_part('year', age(ts, TIMESTAMP '2022-12-25 10:45:30')) AS INT) AS age_y,
        |  CAST(date_part('month', age(ts, TIMESTAMP '2022-12-25 10:45:30')) AS INT) AS age_m,
        |  CAST(date_part('day', age(ts, TIMESTAMP '2022-12-25 10:45:30')) AS INT) AS age_d,
        |  CAST(ts - TIMESTAMP '2022-12-25 10:45:30' AS VARCHAR) AS dt_txt,
        |  CAST(floor(epoch(ts - TIMESTAMP '2022-12-25 10:45:30')) AS BIGINT) AS ep,
        |  ts + INTERVAL '1 month 15 days' AS plus_ts,
        |  ts + INTERVAL '1 day 2 hours' * 3 AS mul_ts
        |FROM events WHERE event_id < 400 ORDER BY event_id""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        import graft.functions.IntervalFunctions
        val anchor = lit("2022-12-25 10:45:30").cast("timestamp")
        val (y, m, d, _) = IntervalFunctions.ageParts($"ts", anchor)
        Tables.T(s, dir).events.filter($"event_id" < 400)
          .select($"event_id",
            IntervalFunctions.ageText($"ts", anchor).as("age_txt"),
            y.cast("int").as("age_y"),
            m.cast("int").as("age_m"),
            d.cast("int").as("age_d"),
            IntervalFunctions.diffJustifyHoursText($"ts", anchor).as("dt_txt"),
            IntervalFunctions.epochSeconds($"ts", anchor).as("ep"),
            ($"ts" + make_interval(
              lit(0), lit(1), lit(0), lit(15), lit(0), lit(0), lit(0)))
              .as("plus_ts"),
            ($"ts" + make_dt_interval(lit(1), lit(2), lit(0), lit(0)) * 3)
              .as("mul_ts"))
          .orderBy("event_id")
    },

    // Geometric surface (geo_ops.c): point distance, box containment /
    // area / center with corner normalization, circle containment /
    // area — plain arithmetic over synthesized coordinates.
    Q("q_fn_geometric", Some(
      """WITH g AS (SELECT c_custkey,
        |    (c_custkey % 97) / 7.0 AS x, (c_custkey % 61) / 5.0 AS y,
        |    1.0 + (c_custkey % 4) AS r
        |  FROM customer WHERE c_custkey <= 500)
        |SELECT c_custkey,
        |  sqrt((x-5.0)*(x-5.0) + (y-5.0)*(y-5.0)) AS dist,
        |  (5.0 >= least(x, x+3.0) AND 5.0 <= greatest(x, x+3.0)
        |    AND 5.0 >= least(y, y-2.0) AND 5.0 <= greatest(y, y-2.0))
        |    AS in_box,
        |  abs(((x+3.0)-x) * ((y-2.0)-y)) AS barea,
        |  (x + (x+3.0))/2 AS bcenter_x,
        |  (y + (y-2.0))/2 AS bcenter_y,
        |  sqrt((x-5.0)*(x-5.0) + (y-5.0)*(y-5.0)) <= r AS in_circle,
        |  pi() * r * r AS carea
        |FROM g ORDER BY c_custkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      import graft.functions.GeometricFunctions._
      val x = (pmod($"c_custkey", lit(97))) / 7.0
      val y = (pmod($"c_custkey", lit(61))) / 5.0
      val r = lit(1.0) + pmod($"c_custkey", lit(4))
      Tables.T(s, dir).customer.filter($"c_custkey" <= 500)
        .select($"c_custkey",
          pointDistance(x, y, lit(5.0), lit(5.0)).as("dist"),
          boxContainsPoint(x, y, x + 3.0, y - 2.0, lit(5.0), lit(5.0))
            .as("in_box"),
          boxArea(x, y, x + 3.0, y - 2.0).as("barea"),
          boxCenter(x, y, x + 3.0, y - 2.0).getField("x").as("bcenter_x"),
          boxCenter(x, y, x + 3.0, y - 2.0).getField("y").as("bcenter_y"),
          circleContainsPoint(x, y, r, lit(5.0), lit(5.0)).as("in_circle"),
          circleArea(r).as("carea"))
        .orderBy("c_custkey")
    },

    // SQL/JSON path (PG 12 / GPDB 7 jsonpath.c, jsonpath_exec.c):
    // member / subscript / wildcard / filter steps over per-order JSON
    // documents built from lineitem — jsonb_path_exists (@?),
    // jsonb_path_query_array, jsonb_path_query_first. The path
    // compiles once at the call site; evaluation is per-row Jackson
    // (the jsonb @> tier). The oracle recomputes every answer from the
    // BASE columns — no JSON parsing — so semantics are pinned by
    // construction, not by a second parser.
    Q("q_fn_jsonpath", Some(
      """WITH li AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
        |    CAST(floor(l_quantity) AS INT) AS q,
        |    CAST(floor(l_extendedprice) AS INT) AS p
        |  FROM lineitem WHERE l_orderkey <= 600)
        |SELECT ok,
        |  bool_or(p > 40000) AS ex,
        |  '[' || coalesce(string_agg(CAST(q AS VARCHAR), ','
        |      ORDER BY ln, q, p) FILTER (p > 40000), '') || ']' AS qa,
        |  CAST((list(q ORDER BY ln, q, p))[1] AS VARCHAR) AS f1
        |FROM li GROUP BY ok ORDER BY ok""".stripMargin)) { (s, dir) =>
      import s.implicits._
      import graft.functions.JsonbFunctions
      val li = Tables.T(s, dir).lineitem.filter($"l_orderkey" <= 600)
        .select($"l_orderkey".as("ok"), $"l_linenumber".as("ln"),
          floor($"l_quantity").cast("int").as("q"),
          floor($"l_extendedprice").cast("int").as("p"))
      val docs = li.groupBy($"ok")
        .agg(transform(sort_array(collect_list(struct($"ln", $"q", $"p"))),
          x => struct(x.getField("q").as("q"), x.getField("p").as("p")))
          .as("items"))
        .select($"ok", to_json(struct($"ok", $"items")).as("j"))
      docs.select($"ok",
        JsonbFunctions.pathExists($"j", "$.items[*] ? (@.p > 40000)")
          .as("ex"),
        JsonbFunctions.pathQueryArray($"j",
          "$.items[*] ? (@.p > 40000).q").as("qa"),
        JsonbFunctions.pathQueryFirst($"j", "$.items[0].q").as("f1"))
        .orderBy("ok")
    },

    // Polygon/path subset (geo_ops.c poly_contain / poly_distance /
    // path_length): shoelace area, perimeter, open-path length,
    // division-free even-odd point containment, and min point-segment
    // distance — all array higher-order functions, one codegen'd scalar
    // per row (no explode, no shuffle). The oracle replays the same
    // edge-indexed formulas over DuckDB lists; sums of per-edge doubles
    // round to 6 dp on both sides to pin summation order.
    Q("q_fn_geometric2", Some {
      def edges(term: String, m: Int): String =
        s"""list_transform(range(0, $m), i -> $term)"""
      // per-edge coordinate accessors over the 5-vertex ring
      val x1 = "xs[i + 1]"; val y1 = "ys[i + 1]"
      val x2 = "xs[((i + 1) % 5) + 1]"; val y2 = "ys[((i + 1) % 5) + 1]"
      val shoelace = edges(s"$x1 * $y2 - $x2 * $y1", 5)
      val seg =
        s"sqrt(($x2 - $x1) * ($x2 - $x1) + ($y2 - $y1) * ($y2 - $y1))"
      val cross = edges(
        s"""CASE WHEN (($y1 > 5.0) <> ($y2 > 5.0))
           |  AND ((5.0 - $x1) * ($y2 - $y1)
           |       - ($x2 - $x1) * (5.0 - $y1)) * sign($y2 - $y1) < 0
           |THEN 1 ELSE 0 END""".stripMargin, 5)
      // t (clamped projection) inlined — list lambdas have no locals
      val t =
        s"""(CASE WHEN ($x2 - $x1) * ($x2 - $x1)
           |    + ($y2 - $y1) * ($y2 - $y1) > 0
           |  THEN greatest(0.0, least(1.0,
           |    ((5.0 - $x1) * ($x2 - $x1) + (5.0 - $y1) * ($y2 - $y1))
           |    / (($x2 - $x1) * ($x2 - $x1) + ($y2 - $y1) * ($y2 - $y1))))
           |  ELSE 0.0 END)""".stripMargin
      val segDist = "list_min(" + edges(
        s"""sqrt((5.0 - ($x1 + $t * ($x2 - $x1)))
           |  * (5.0 - ($x1 + $t * ($x2 - $x1)))
           |  + (5.0 - ($y1 + $t * ($y2 - $y1)))
           |  * (5.0 - ($y1 + $t * ($y2 - $y1))))""".stripMargin, 5) + ")"
      s"""WITH g AS (SELECT c_custkey,
         |    (c_custkey % 97) / 7.0 AS x, (c_custkey % 61) / 5.0 AS y
         |  FROM customer WHERE c_custkey <= 500),
         |v AS (SELECT c_custkey,
         |    [x, x + 4.0, x + 5.0, x + 2.0, x - 1.0] AS xs,
         |    [y, y - 1.0, y + 2.0, y + 4.0, y + 3.0] AS ys
         |  FROM g)
         |SELECT c_custkey,
         |  round(abs(list_sum($shoelace)) / 2, 6) AS parea,
         |  round(list_sum(${edges(seg, 5)}), 6) AS perim,
         |  round(list_sum(${edges(seg, 4)}), 6) AS plen,
         |  list_sum($cross) % 2 = 1 AS inside,
         |  round($segDist, 6) AS pdist
         |FROM v ORDER BY c_custkey""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      import graft.functions.GeometricFunctions._
      val x = (pmod($"c_custkey", lit(97))) / 7.0
      val y = (pmod($"c_custkey", lit(61))) / 5.0
      Tables.T(s, dir).customer.filter($"c_custkey" <= 500)
        .select($"c_custkey",
          array(x, x + 4.0, x + 5.0, x + 2.0, x - 1.0).as("xs"),
          array(y, y - 1.0, y + 2.0, y + 4.0, y + 3.0).as("ys"))
        .select($"c_custkey",
          round(polyArea($"xs", $"ys"), 6).as("parea"),
          round(polyPerimeter($"xs", $"ys"), 6).as("perim"),
          round(pathLength($"xs", $"ys", closed = false), 6).as("plen"),
          polyContainsPoint($"xs", $"ys", lit(5.0), lit(5.0))
            .as("inside"),
          round(pathPointDistance($"xs", $"ys", lit(5.0), lit(5.0),
            closed = true), 6).as("pdist"))
        .orderBy("c_custkey")
    },

    // inet/cidr surface (network.c): host/masklen/network/broadcast and
    // `<<` containment, all as integer arithmetic over a synthesized
    // IPv4 per customer (no inet column in the fixtures; the functions
    // are generic).
    Q("q_fn_network", Some(
      """WITH c AS (SELECT c_custkey,
        |    (c_custkey * 2654435761) % 4294967296 AS ipn
        |  FROM customer WHERE c_custkey <= 500),
        |i AS (SELECT c_custkey, ipn,
        |    printf('%d.%d.%d.%d', CAST(ipn//16777216 AS INT)%256,
        |      CAST(ipn//65536 AS INT)%256, CAST(ipn//256 AS INT)%256,
        |      CAST(ipn%256 AS INT)) AS ip FROM c)
        |SELECT c_custkey, ip,
        |  ip AS host24,
        |  24 AS mlen,
        |  printf('%d.%d.%d.0', CAST(ipn//16777216 AS INT)%256,
        |    CAST(ipn//65536 AS INT)%256, CAST(ipn//256 AS INT)%256)
        |    || '/24' AS net24,
        |  printf('%d.%d.%d.255', CAST(ipn//16777216 AS INT)%256,
        |    CAST(ipn//65536 AS INT)%256, CAST(ipn//256 AS INT)%256)
        |    || '/24' AS bcast24,
        |  ipn >= 2147483648 AS in_top_half,
        |  (ipn - ipn % 65536) =
        |    (CAST(192 AS BIGINT)*16777216 + 168*65536) AS in_192_168
        |FROM i ORDER BY c_custkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      import graft.functions.NetworkFunctions._
      val ipn = pmod($"c_custkey" * 2654435761L, lit(4294967296L))
      Tables.T(s, dir).customer.filter($"c_custkey" <= 500)
        .withColumn("ip", inetNtoa(ipn))
        .withColumn("cidr24", concat($"ip", lit("/24")))
        .select($"c_custkey", $"ip",
          host($"cidr24").as("host24"),
          maskLen($"cidr24").as("mlen"),
          network($"cidr24").as("net24"),
          broadcastAddr($"cidr24").as("bcast24"),
          containedIn($"ip", lit("128.0.0.0/1")).as("in_top_half"),
          containedIn($"ip", lit("192.168.0.0/16")).as("in_192_168"))
        .orderBy("c_custkey")
    },

    // contrib/cube N-dim boxes (cube.c:37-89): per-order 3-D bounding
    // boxes over (quantity, discount¢, tax¢) — all exact integers in
    // double — probed against a fixed query cube: dim / is_point /
    // containment / overlap / distance / volume / union / inter /
    // enlarge. Index-order folds; sqrt is IEEE-correctly-rounded in
    // both engines, so round-6 distances hash-compare.
    Q("q_fn_cube", Some(
      """WITH g AS (SELECT l_orderkey,
        |    min(CAST(l_quantity AS DOUBLE)) AS q1,
        |    max(CAST(l_quantity AS DOUBLE)) AS q2,
        |    min(floor(l_discount * 100 + 0.5)) AS d1,
        |    max(floor(l_discount * 100 + 0.5)) AS d2,
        |    min(floor(l_tax * 100 + 0.5)) AS t1,
        |    max(floor(l_tax * 100 + 0.5)) AS t2
        |  FROM lineitem WHERE l_orderkey < 800 GROUP BY 1),
        |e AS (SELECT *,
        |    greatest(0.0, q1 - 30.0, 5.0 - q2) AS gq,
        |    greatest(0.0, d1 - 5.0, 1.0 - d2) AS gd,
        |    greatest(0.0, t1 - 5.0, 1.0 - t2) AS gt
        |  FROM g)
        |SELECT l_orderkey, CAST(3 AS INT) AS dim,
        |  (q1 = q2 AND d1 = d2 AND t1 = t2) AS is_pt,
        |  (5.0 <= q1 AND 30.0 >= q2 AND 1.0 <= d1 AND 5.0 >= d2
        |    AND 1.0 <= t1 AND 5.0 >= t2) AS inside,
        |  (5.0 <= q2 AND q1 <= 30.0 AND 1.0 <= d2 AND d1 <= 5.0
        |    AND 1.0 <= t2 AND t1 <= 5.0) AS overl,
        |  round(sqrt(gq * gq + gd * gd + gt * gt), 6) AS dist,
        |  (q2 - q1) * (d2 - d1) * (t2 - t1) AS vol,
        |  least(q1, 5.0) AS ull, greatest(q2, 30.0) AS uur,
        |  d1 - 2.0 AS ell, least(t2, 5.0) AS iur
        |FROM e ORDER BY l_orderkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      import graft.functions.CubeFunctions._
      val g = Tables.T(s, dir).lineitem.filter($"l_orderkey" < 800)
        .select($"l_orderkey",
          $"l_quantity".cast("double").as("q"),
          floor($"l_discount" * 100 + 0.5).as("d"),
          floor($"l_tax" * 100 + 0.5).as("t"))
        .groupBy("l_orderkey")
        .agg(min($"q").as("q1"), max($"q").as("q2"),
          min($"d").as("d1"), max($"d").as("d2"),
          min($"t").as("t1"), max($"t").as("t2"))
      val box = cube(Seq($"q1", $"d1", $"t1"), Seq($"q2", $"d2", $"t2"))
      val qbox = cube(Seq(lit(5.0), lit(1.0), lit(1.0)),
        Seq(lit(30.0), lit(5.0), lit(5.0)))
      g.select($"l_orderkey",
        cubeDim(box).as("dim"),
        cubeIsPoint(box).as("is_pt"),
        cubeContains(qbox, box).as("inside"),
        cubeOverlap(qbox, box).as("overl"),
        round(cubeDistance(box, qbox), 6).as("dist"),
        cubeSize(box).as("vol"),
        cubeLlCoord(cubeUnion(box, qbox), 1).as("ull"),
        cubeUrCoord(cubeUnion(box, qbox), 1).as("uur"),
        cubeLlCoord(cubeEnlarge(box, lit(2.0)), 2).as("ell"),
        cubeUrCoord(cubeInter(box, qbox), 3).as("iur"))
        .orderBy("l_orderkey")
    },

    // ---- money (cash.c) --------------------------------------------
    // cash_in accepts '$1,234.56', accounting '($12.34)', bare
    // numerics; storage is exact cents (DECIMAL(19,2) here ≡ cash.c's
    // int64); cash_out renders '-$1,234.56'. The text forms are
    // constructed identically in both engines, then graft parses them
    // back with moneyIn — the roundtrip IS the test.
    Q("q_fn_money", Some(
      """WITH m AS (SELECT c_custkey,
        |    (c_custkey * 131071) % 2000000 - 1000000 AS cents
        |  FROM customer WHERE c_custkey <= 300),
        |f AS (SELECT c_custkey, cents,
        |    abs(cents) // 100 AS dollars, abs(cents) % 100 AS rem FROM m),
        |t AS (SELECT c_custkey, cents,
        |    format('{:,}', dollars) || '.' ||
        |      lpad(CAST(rem AS VARCHAR), 2, '0') AS grouped,
        |    CAST(dollars AS VARCHAR) || '.' ||
        |      lpad(CAST(rem AS VARCHAR), 2, '0') AS plain,
        |    CASE WHEN cents < 0 THEN '-' ELSE '' END AS sgn FROM f)
        |SELECT c_custkey,
        |  CASE WHEN c_custkey % 3 = 0 THEN
        |         CASE WHEN cents < 0 THEN '($' || grouped || ')'
        |              ELSE '$' || grouped END
        |       WHEN c_custkey % 3 = 1 THEN sgn || plain
        |       ELSE sgn || '$' || plain END AS txt,
        |  CAST(CAST(sgn || plain AS DECIMAL(19,2)) AS DOUBLE) AS amt,
        |  sgn || '$' || grouped AS rendered
        |FROM t ORDER BY c_custkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      import graft.functions.MoneyMacFunctions._
      val f = Tables.T(s, dir).customer.filter($"c_custkey" <= 300)
        .withColumn("cents",
          pmod($"c_custkey" * 131071L, lit(2000000L)) - 1000000L)
        .withColumn("dollars", floor(abs($"cents") / 100d).cast("long"))
        .withColumn("rem", pmod(abs($"cents"), lit(100L)))
      val grouped = concat(format_number($"dollars", 0), lit("."),
        lpad($"rem".cast("string"), 2, "0"))
      val plain = concat($"dollars".cast("string"), lit("."),
        lpad($"rem".cast("string"), 2, "0"))
      val sgn = when($"cents" < 0, lit("-")).otherwise(lit(""))
      val txt = when(pmod($"c_custkey", lit(3)) === 0,
        when($"cents" < 0, concat(lit("($"), grouped, lit(")")))
          .otherwise(concat(lit("$"), grouped)))
        .when(pmod($"c_custkey", lit(3)) === 1, concat(sgn, plain))
        .otherwise(concat(sgn, lit("$"), plain))
      f.withColumn("txt", txt)
        .withColumn("money", moneyIn($"txt"))
        .withColumn("rendered", moneyOut($"money"))
        // exact cents → the double is identical in both engines; the
        // driver compare reads DuckDB decimals through pandas as floats
        .select($"c_custkey", $"txt", $"money".cast("double").as("amt"),
          $"rendered")
        .orderBy("c_custkey")
    },

    // ---- macaddr (mac.c) -------------------------------------------
    // macaddr_in normalizes dashed/dotted/bare inputs to the canonical
    // lowercase colon form; trunc() zeroes the NIC octets; comparison
    // is byte order (≡ lexicographic on the fixed-width canonical
    // string); ~/&/| run in the 48-bit space.
    Q("q_fn_macaddr", Some(
      """WITH m AS (SELECT c_custkey,
        |    (c_custkey * 1099511627 + 777) % 281474976710656 AS v
        |  FROM customer WHERE c_custkey <= 300),
        |h AS (SELECT c_custkey, v, printf('%012x', v) AS hx,
        |    printf('%012x', 281474976710655 - v) AS nx,
        |    printf('%012x', v & 281474959933695) AS ax FROM m)
        |SELECT c_custkey,
        |  substr(hx,1,2)||':'||substr(hx,3,2)||':'||substr(hx,5,2)||':'||
        |    substr(hx,7,2)||':'||substr(hx,9,2)||':'||substr(hx,11,2) AS mac,
        |  substr(hx,1,2)||':'||substr(hx,3,2)||':'||substr(hx,5,2)||
        |    ':00:00:00' AS tr,
        |  substr(nx,1,2)||':'||substr(nx,3,2)||':'||substr(nx,5,2)||':'||
        |    substr(nx,7,2)||':'||substr(nx,9,2)||':'||substr(nx,11,2)
        |    AS notm,
        |  substr(ax,1,2)||':'||substr(ax,3,2)||':'||substr(ax,5,2)||':'||
        |    substr(ax,7,2)||':'||substr(ax,9,2)||':'||substr(ax,11,2)
        |    AS anded,
        |  ((v // 1099511627776) & 2) <> 0 AS is_local,
        |  substr(hx,1,2)||':'||substr(hx,3,2)||':'||substr(hx,5,2)||':'||
        |    substr(hx,7,2)||':'||substr(hx,9,2)||':'||substr(hx,11,2)
        |    < '80:00:00:00:00:00' AS lt_half
        |FROM h ORDER BY c_custkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      import graft.functions.MoneyMacFunctions._
      val withV = Tables.T(s, dir).customer.filter($"c_custkey" <= 300)
        .withColumn("v", $"c_custkey" * 1099511627L + 777L)
        .withColumn("hx", lpad(lower(conv($"v", 10, 16)), 12, "0"))
      // raw input forms: dashed UPPERCASE / dotted Cisco / bare hex —
      // macIn must normalize all three to the canonical colon form
      val dashed = upper(concat_ws("-",
        (0 until 6).map(i => substring($"hx", i * 2 + 1, 2)): _*))
      val dotted = concat_ws(".",
        (0 until 3).map(i => substring($"hx", i * 4 + 1, 4)): _*)
      val raw = when(pmod($"c_custkey", lit(3)) === 0, dashed)
        .when(pmod($"c_custkey", lit(3)) === 1, dotted)
        .otherwise($"hx")
      withV.withColumn("mac", macIn(raw))
        .select($"c_custkey", $"mac",
          macTrunc($"mac").as("tr"),
          macNot($"mac").as("notm"),
          macAnd($"mac", lit("ff:ff:ff:00:00:ff")).as("anded"),
          macIsLocal($"mac").as("is_local"),
          ($"mac" < "80:00:00:00:00:00").as("lt_half"))
        .orderBy("c_custkey")
    },

    // ---- hashing / encoding (encode.c, uuid.c) ---------------------
    Q("q_fn_hash_encode", Some(
      """SELECT n_nationkey,
        |  md5(n_name) AS h_md5,
        |  sha256(n_name) AS h_sha,
        |  to_base64(n_name::BLOB) AS b64,
        |  lower(hex(n_name)) AS hx
        |FROM nation ORDER BY n_nationkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      Tables.T(s, dir).nation.select(
        $"n_nationkey",
        md5($"n_name".cast("binary")).as("h_md5"),
        sha2($"n_name".cast("binary"), 256).as("h_sha"),
        base64($"n_name".cast("binary")).as("b64"),
        lower(hex($"n_name")).as("hx"))
        .orderBy("n_nationkey")
    },

    // ---- composite/row types (rowtypes.c → StructType) -------------
    // Struct output serialized as compact JSON (identical on both engines)
    // so the pandas compare sees VARCHAR, not dict cells.
    Q("q_fn_struct", Some(
      """SELECT s_suppkey,
        |  to_json({'name': s_name, 'nation': s_nationkey}) AS info,
        |  ({'name': s_name, 'nation': s_nationkey}).name AS info_name
        |FROM supplier ORDER BY s_suppkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val info = struct($"s_name".as("name"), $"s_nationkey".as("nation"))
      Tables.T(s, dir).supplier.select(
        $"s_suppkey", to_json(info).as("info"),
        info.getField("name").as("info_name"))
        .orderBy("s_suppkey")
    },

    // ---- bit ops (int.c operators) ---------------------------------
    Q("q_fn_bitops", Some(
      """SELECT n_nationkey,
        |  n_nationkey & 5 AS band, n_nationkey | 5 AS bor,
        |  xor(n_nationkey, 5) AS bxor,
        |  n_nationkey << 2 AS shl, n_nationkey >> 1 AS shr,
        |  bin(n_nationkey) AS binstr
        |FROM nation ORDER BY n_nationkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      Tables.T(s, dir).nation.select(
        $"n_nationkey",
        $"n_nationkey".bitwiseAND(5).as("band"),
        $"n_nationkey".bitwiseOR(5).as("bor"),
        $"n_nationkey".bitwiseXOR(5).as("bxor"),
        shiftleft($"n_nationkey", 2).as("shl"),
        shiftright($"n_nationkey", 1).as("shr"),
        bin($"n_nationkey").as("binstr"))
        .orderBy("n_nationkey")
    },

    // ---- GP analytics extras ---------------------------------------
    // linear_interpolate (utils/adt/interpolate.c) — graft PgFunctions.
    Q("q_fn_interpolate", Some(
      """SELECT s_suppkey,
        |  round(0.0 + (1000.0 - 0.0) * (s_acctbal - 0.0) / (10000.0 - 0.0), 6)
        |    AS scaled
        |FROM supplier ORDER BY s_suppkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      Tables.T(s, dir).supplier.select(
        $"s_suppkey",
        round(PgFunctions.linearInterpolate(
          $"s_acctbal", lit(0.0), lit(0.0), lit(10000.0), lit(1000.0)), 6)
          .as("scaled"))
        .orderBy("s_suppkey")
    },

    // posexplode — SRF with ordinality (FunctionScan, §2.1); DuckDB lacks
    // WITH ORDINALITY → generate_series lateral join oracle.
    Q("q_fn_posexplode", Some(
      """SELECT doc_id, CAST(r['pos'] AS INT) AS pos, r['word'] AS word
        |FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
        |    i -> {'pos': i - 1, 'word': toks[i]})) AS r
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents WHERE doc_id < 3) d)
        |ORDER BY doc_id, pos""".stripMargin)) { (s, dir) =>
      import s.implicits._
      Tables.T(s, dir).documents.filter($"doc_id" < 3)
        .select($"doc_id", posexplode(split($"text", " ")))
        .withColumnRenamed("col", "word")
        .orderBy("doc_id", "pos")
    },

    // GP complex type arithmetic (pg_type.h:380, complex_type.c) as
    // struct(re, im) expressions.
    Q("q_complex", Some(
      """SELECT s_suppkey,
        |  s_acctbal / 1000 * 2 - s_nationkey AS prod_re,
        |  s_acctbal / 1000 + 2 * s_nationkey AS prod_im,
        |  round(sqrt((s_acctbal / 1000 * 2 - s_nationkey) ^ 2
        |           + (s_acctbal / 1000 + 2 * s_nationkey) ^ 2), 6) AS modulus
        |FROM supplier ORDER BY s_suppkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      import graft.functions.ComplexFunctions._
      val z = complex($"s_acctbal" / 1000, $"s_nationkey")
      val w = complex(lit(2.0), lit(1.0))
      val p = cmul(z, w)
      Tables.T(s, dir).supplier.select(
        $"s_suppkey",
        re(p).as("prod_re"), im(p).as("prod_im"),
        round(cabs(p), 6).as("modulus"))
        .orderBy("s_suppkey")
    },

    // Matrix ops over 2-D arrays (GP matrix.c): add, scale, multiply.
    // m1 = [[bal/1000, 1],[2, nationkey]], m2 = [[1,2],[3,4]] constant —
    // the oracle states the closed-form arithmetic.
    // Result cells are projected as scalar doubles (matrix_ij) so the
    // pandas compare never sees nested-array cells; the matrix algebra
    // itself still runs through MatrixFunctions.
    Q("q_fn_matrix", Some(
      """SELECT s_suppkey,
        |  s_acctbal/1000 + 1.0 AS msum_11, 3.0 AS msum_12,
        |  5.0 AS msum_21, CAST(s_nationkey AS DOUBLE) + 4.0 AS msum_22,
        |  s_acctbal/1000 * 2 AS mtwice_11, 2.0 AS mtwice_12,
        |  4.0 AS mtwice_21, CAST(s_nationkey AS DOUBLE) * 2 AS mtwice_22,
        |  s_acctbal/1000 * 1.0 + 1.0 * 3.0 AS mprod_11,
        |  s_acctbal/1000 * 2.0 + 1.0 * 4.0 AS mprod_12,
        |  2.0 * 1.0 + CAST(s_nationkey AS DOUBLE) * 3.0 AS mprod_21,
        |  2.0 * 2.0 + CAST(s_nationkey AS DOUBLE) * 4.0 AS mprod_22
        |FROM supplier ORDER BY s_suppkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      import graft.functions.MatrixFunctions._
      val m1 = array(
        array($"s_acctbal" / 1000, lit(1.0)),
        array(lit(2.0), $"s_nationkey".cast("double")))
      val m2 = array(array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0)))
      def cell(m: org.apache.spark.sql.Column, i: Int, j: Int) =
        element_at(element_at(m, i), j)
      val (msum, mtwice, mprod) =
        (madd(m1, m2), mscale(m1, lit(2.0)), mmul(m1, m2, 2, 2, 2))
      Tables.T(s, dir).supplier.select(
        Seq($"s_suppkey") ++
          (for { i <- 1 to 2; j <- 1 to 2 } yield cell(msum, i, j).as(s"msum_$i$j")) ++
          (for { i <- 1 to 2; j <- 1 to 2 } yield cell(mtwice, i, j).as(s"mtwice_$i$j")) ++
          (for { i <- 1 to 2; j <- 1 to 2 } yield cell(mprod, i, j).as(s"mprod_$i$j")): _*)
        .orderBy("s_suppkey")
    },

    // N-dim array surface (reference: arrayfuncs.c array_dims/array_ndims/
    // slicing, generate_subscripts as SRF-in-FROM): a per-nation dynamic
    // 2-D matrix, PG-style dims string, a[1:2][2:3] slice (flattened to a
    // compare-friendly string), and the exploded subscript range.
    Q("q_fn_array_nd", Some(
      """WITH m AS (
        |  SELECT n_nationkey,
        |    list_transform(range(1, (n_nationkey % 3) + 3), i ->
        |      list_transform(range(1, 4), j -> i * 10 + j)) AS mat
        |  FROM nation)
        |SELECT n_nationkey,
        |  '[1:' || len(mat) || '][1:' || len(mat[1]) || ']' AS dims,
        |  2 AS ndims,
        |  array_to_string(flatten(list_transform(mat[1:2], r -> r[2:3])),
        |    ',') AS sliced,
        |  CAST(s AS INT) AS sub
        |FROM m, unnest(range(1, len(mat) + 1)) t(s)
        |ORDER BY n_nationkey, sub""".stripMargin)) { (s, dir) =>
      import s.implicits._
      import graft.functions.MatrixFunctions._
      val mat = transform(sequence(lit(1), ($"n_nationkey" % 3 + 2).cast("int")),
        i => transform(sequence(lit(1), lit(3)), j => i * 10 + j))
      Tables.T(s, dir).nation
        .select($"n_nationkey", mat.as("mat"))
        .select($"n_nationkey",
          dims2d($"mat").as("dims"),
          ndims2d.as("ndims"),
          array_join(flatten(
            slice2d($"mat", lit(1), lit(2), lit(2), lit(3))), ",").as("sliced"),
          explode(generateSubscripts($"mat")).as("sub"))
        .orderBy("n_nationkey", "sub")
    },

    // width_bucket (PG histogram bucketing; DuckDB lacks it → CASE oracle).
    Q("q_fn_width_bucket", Some(
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 0
        |       WHEN c_acctbal >= 10000 THEN 11
        |       ELSE CAST(floor(c_acctbal * 10 / 10000) AS INT) + 1 END AS bucket
        |FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        Tables.T(s, dir).customer.filter($"c_custkey" <= 300).select(
          $"c_custkey",
          PgFunctions.widthBucket($"c_acctbal", lit(0d), lit(10000d), lit(10L))
            .cast("int").as("bucket"))
          .orderBy("c_custkey")
    },

    // EXTRACT field breadth (timestamp.c timestamp_part): quarter, ISO
    // week (both engines implement ISO 8601 week-of-year), ISO day of
    // week (PG isodow Monday=1 — Spark's dayofweek is Sunday=1, so the
    // mapping is ((dow+5) mod 7)+1), day of year.
    Q("q_fn_extract", Some(
      """SELECT o_orderkey,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  CAST(week(o_orderdate) AS INT) AS iso_week,
        |  CAST(isodow(o_orderdate) AS INT) AS iso_dow,
        |  CAST(dayofyear(o_orderdate) AS INT) AS doy
        |FROM orders WHERE o_orderkey <= 1000
        |ORDER BY o_orderkey""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        Tables.T(s, dir).orders.filter($"o_orderkey" <= 1000).select(
          $"o_orderkey",
          quarter($"o_orderdate").as("qtr"),
          weekofyear($"o_orderdate").as("iso_week"),
          (((dayofweek($"o_orderdate") + 5) % 7) + 1).as("iso_dow"),
          dayofyear($"o_orderdate").as("doy"))
          .orderBy("o_orderkey")
    },

    // Multi-argument unnest WITH ORDINALITY (PG's ROWS FROM zip —
    // funcapi.c; shorter arrays pad with NULL): arrays_zip + posexplode
    // gives the same element-wise zip with a 1-based ordinal.
    Q("q_fn_unnest_multi", Some(
      """WITH src AS (SELECT n_nationkey AS id,
        |    [n_nationkey, n_regionkey, len(n_name)] AS a,
        |    [upper(substr(n_name,1,2)), CAST(n_regionkey AS VARCHAR)] AS b
        |  FROM nation WHERE n_nationkey < 5)
        |SELECT id, CAST(generate_subscripts(a, 1) AS INT) AS ord,
        |  unnest(a) AS x,
        |  CASE WHEN generate_subscripts(a, 1) <= len(b)
        |       THEN b[generate_subscripts(a, 1)] END AS y
        |FROM src ORDER BY id, ord""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val src = Tables.T(s, dir).nation.filter($"n_nationkey" < 5).select(
          $"n_nationkey".as("id"),
          array($"n_nationkey".cast("long"), $"n_regionkey".cast("long"),
            length($"n_name").cast("long")).as("a"),
          array(upper(substring($"n_name", 1, 2)),
            $"n_regionkey".cast("string")).as("b"))
        src.select($"id",
          posexplode(arrays_zip($"a", $"b")).as(Seq("ord0", "z")))
          .select($"id", ($"ord0" + 1).cast("int").as("ord"),
            $"z.a".as("x"), $"z.b".as("y"))
          .orderBy("id", "ord")
    },

    // uuid (uuid.c + uuid-ossp v3): name-based md5 UUIDs — the
    // deterministic generation a replayable pipeline needs; random v4
    // can't be verified or reproduced.
    Q("q_fn_uuid", Some(
      """WITH h AS (SELECT c_custkey, md5(c_name) AS h
        |           FROM customer WHERE c_custkey <= 200)
        |SELECT c_custkey,
        |  lower(substr(h,1,8) || '-' || substr(h,9,4) || '-3' || substr(h,14,3)
        |    || '-' || substr('89ab',
        |         ((strpos('0123456789abcdef', substr(h,17,1)) - 1) % 4) + 1, 1)
        |    || substr(h,18,3) || '-' || substr(h,21,12)) AS uuid,
        |  true AS valid, '3' AS ver
        |FROM h ORDER BY c_custkey""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val u = PgFunctions.uuidFromText($"c_name")
        Tables.T(s, dir).customer.filter($"c_custkey" <= 200).select(
          $"c_custkey", u.as("uuid"),
          PgFunctions.isUuid(u).as("valid"),
          substring(u, 15, 1).as("ver"))
          .orderBy("c_custkey")
    },

    // Enum types (enum.c, typecmds.c): comparison follows DECLARATION
    // order, not label text — the enum here reverses the lexical order
    // of the priority labels, so an enum-ordered sort differs from a
    // string sort (which is exactly what the oracle CASE encodes).
    Q("q_fn_enum", Some(
      """SELECT o_orderkey, o_orderpriority,
        |  CASE o_orderpriority
        |    WHEN '5-LOW' THEN 0 WHEN '4-NOT SPECIFIED' THEN 1
        |    WHEN '3-MEDIUM' THEN 2 WHEN '2-HIGH' THEN 3
        |    WHEN '1-URGENT' THEN 4 END AS prio_ord,
        |  '5-LOW' AS prio_first, '1-URGENT' AS prio_last
        |FROM orders WHERE o_orderkey <= 2000
        |ORDER BY prio_ord, o_orderkey""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        GpSqlDialect.execute(s,
          """CREATE TYPE prio AS ENUM
            |('5-LOW', '4-NOT SPECIFIED', '3-MEDIUM', '2-HIGH', '1-URGENT')""".stripMargin,
          "/tmp/never")
        Tables.T(s, dir).orders.filter($"o_orderkey" <= 2000).select(
          $"o_orderkey",
          GpSqlDialect.enumAssert("prio", $"o_orderpriority")
            .as("o_orderpriority"),
          GpSqlDialect.enumOrdinal("prio", $"o_orderpriority").as("prio_ord"),
          lit(GpSqlDialect.enumFirst("prio")).as("prio_first"),
          lit(GpSqlDialect.enumLast("prio")).as("prio_last"))
          .orderBy("prio_ord", "o_orderkey")
    },

    // Range types (rangetypes.c): tsrange in canonical half-open form as
    // struct(lower, upper) + pure-Column operators (@>, &&, *, -) — all
    // codegen'd comparisons, so range predicates push down like any
    // scalar filter. The 30-day ship window vs the fixed 95Q2 quarter.
    Q("q_fn_range", Some(
      """SELECT l_orderkey, l_linenumber,
        |  (l_shipdate < TIMESTAMP '1995-07-01'
        |   AND TIMESTAMP '1995-04-01' < l_shipdate + INTERVAL 30 DAY) AS in_q2,
        |  (l_shipdate <= TIMESTAMP '1995-05-15'
        |   AND TIMESTAMP '1995-05-15' < l_shipdate + INTERVAL 30 DAY) AS has_mid,
        |  GREATEST(0, CAST(epoch(LEAST(l_shipdate + INTERVAL 30 DAY, TIMESTAMP '1995-07-01'))
        |    - epoch(GREATEST(l_shipdate, TIMESTAMP '1995-04-01')) AS BIGINT)) AS isect_sec,
        |  CASE
        |    WHEN l_shipdate + INTERVAL 30 DAY <= TIMESTAMP '1995-04-01'
        |      OR TIMESTAMP '1995-07-01' <= l_shipdate THEN 2592000
        |    WHEN l_shipdate < TIMESTAMP '1995-04-01'
        |      THEN CAST(epoch(TIMESTAMP '1995-04-01') - epoch(l_shipdate) AS BIGINT)
        |    WHEN l_shipdate + INTERVAL 30 DAY > TIMESTAMP '1995-07-01'
        |      THEN CAST(epoch(l_shipdate + INTERVAL 30 DAY) - epoch(TIMESTAMP '1995-07-01') AS BIGINT)
        |    ELSE 0 END AS minus_sec
        |FROM lineitem WHERE l_orderkey <= 2000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        import RangeFunctions._
        val shipWin = range($"l_shipdate",
          $"l_shipdate" + expr("INTERVAL 30 DAY"))
        val q2 = range(lit("1995-04-01").cast("timestamp"),
          lit("1995-07-01").cast("timestamp"))
        val isect = intersect(shipWin, q2)
        val diff = minus(shipWin, q2)
        def secs(r: org.apache.spark.sql.Column) = greatest(lit(0L),
          unix_timestamp(upperBound(r)) - unix_timestamp(lowerBound(r)))
        Tables.T(s, dir).lineitem.filter($"l_orderkey" <= 2000).select(
          $"l_orderkey", $"l_linenumber",
          overlaps(shipWin, q2).as("in_q2"),
          containsElem(shipWin, lit("1995-05-15").cast("timestamp"))
            .as("has_mid"),
          secs(isect).as("isect_sec"),
          coalesce(secs(diff), lit(0L)).as("minus_sec"))
          .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- time / timetz typed columns (date.c, date.h:25-34) --------
    // PG `time` = int64 micros-of-day; the full arithmetic surface
    // (make_time, +/- interval with day wrap, time - time, EXTRACT,
    // time_out text) as pure integer-micros codegen. The oracle spells
    // the identical arithmetic over epoch_us, so the compare is exact.
    Q("q_fn_time", Some(
      """WITH b AS (
         |  SELECT event_id,
         |    epoch_us(ts) - epoch_us(date_trunc('day', ts)) AS tod
         |  FROM events WHERE event_id < 500)
         |SELECT event_id, tod AS tod_us,
         |  (tod + 5400000000) % 86400000000 AS plus90_us,
         |  ((tod - 14400000000) % 86400000000 + 86400000000)
         |    % 86400000000 AS minus4h_us,
         |  (tod + 5400000000) % 86400000000 - tod AS diff_us,
         |  tod // 3600000000 AS h,
         |  (tod // 60000000) % 60 AS m,
         |  (tod // 1000000) % 60 AS s,
         |  tod % 60000000 AS micros_part,
         |  (tod // 3600000000) * 3600000000
         |    + ((tod // 60000000) % 60) * 60000000
         |    + CAST(floor((tod % 60000000) / 1000000.0 * 1000000 + 0.5)
         |           AS BIGINT) = tod AS mk_eq,
         |  printf('%02d:%02d:%02d', tod // 3600000000,
         |      (tod // 60000000) % 60, (tod // 1000000) % 60)
         |    || CASE WHEN tod % 1000000 = 0 THEN ''
         |       ELSE '.' || regexp_replace(
         |         lpad(CAST(tod % 1000000 AS VARCHAR), 6, '0'), '0+$', '')
         |       END AS t_text
         |FROM b ORDER BY event_id""".stripMargin)) { (s, dir) =>
      import s.implicits._
      import graft.functions.TimeFunctions._
      val tod = PgFunctions.timeOfDayMicros($"ts")
      val secFrac = (tod % lit(60L * UsPerSec)).cast("double") / lit(1e6)
      Tables.T(s, dir).events.filter($"event_id" < 500).select(
        $"event_id", tod.as("tod_us"),
        timePlInterval(tod, lit(90L * 60 * UsPerSec)).as("plus90_us"),
        timeMiInterval(tod, lit(4L * 3600 * UsPerSec)).as("minus4h_us"),
        timeMiTime(timePlInterval(tod, lit(90L * 60 * UsPerSec)), tod)
          .as("diff_us"),
        timePart(tod, "hour").as("h"),
        timePart(tod, "minute").as("m"),
        timePart(tod, "second").as("s"),
        timePart(tod, "microseconds").as("micros_part"),
        (makeTime(timePart(tod, "hour"), timePart(tod, "minute"), secFrac)
          === tod).as("mk_eq"),
        timeText(tod).as("t_text"))
        .orderBy("event_id")
    },

    // PG `timetz` = (micros-of-day, seconds-west zone) — comparison by
    // GMT-equivalent instant (timetz_cmp_internal date.c:2206), fixed-
    // offset AT TIME ZONE conversion (timetz_zone date.c:2753), and the
    // east-positive ±HH[:MM] display. Zones derived per-row so every
    // half-hour offset in [-6:30, +6:30] is exercised.
    Q("q_fn_timetz", Some {
      // named zones resolve ONCE via zoneinfo at the pinned reference
      // date (TimeFunctions.timetzZoneNamed) — the oracle sees the
      // derived fixed offsets, the same IANA data PG reads
      val ref = java.time.LocalDate.of(2024, 1, 15)
      val ny = graft.functions.TimeFunctions
        .zoneNamedWestSecs("America/New_York", ref)   //  18000 (EST)
      val syd = graft.functions.TimeFunctions
        .zoneNamedWestSecs("Australia/Sydney", ref)   // -39600 (AEDT)
      s"""WITH b AS (
         |  SELECT event_id,
         |    epoch_us(ts) - epoch_us(date_trunc('day', ts)) AS tod,
         |    CAST(-(((user_id % 27) - 13) * 1800) AS INT) AS zone
         |  FROM events WHERE event_id < 500)
         |SELECT event_id, tod AS tod_us, zone,
         |  tod + CAST(zone AS BIGINT) * 1000000 AS gmt_us,
         |  ((tod + (CAST(zone AS BIGINT) - ($ny)) * 1000000)
         |    % 86400000000 + 86400000000) % 86400000000 AS ny_us,
         |  ((tod + (CAST(zone AS BIGINT) - ($syd)) * 1000000)
         |    % 86400000000 + 86400000000) % 86400000000 AS syd_us,
         |  ((tod + (CAST(zone AS BIGINT) + 19800) * 1000000) % 86400000000
         |    + 86400000000) % 86400000000 AS ist_us,
         |  printf('%02d:%02d:%02d', tod // 3600000000,
         |      (tod // 60000000) % 60, (tod // 1000000) % 60)
         |    || CASE WHEN tod % 1000000 = 0 THEN ''
         |       ELSE '.' || regexp_replace(
         |         lpad(CAST(tod % 1000000 AS VARCHAR), 6, '0'), '0+$$', '')
         |       END
         |    || CASE WHEN -zone < 0 THEN '-' ELSE '+' END
         |    || printf('%02d', abs(-zone) // 3600)
         |    || CASE WHEN (abs(-zone) // 60) % 60 = 0 THEN ''
         |       ELSE printf(':%02d', (abs(-zone) // 60) % 60) END
         |    AS ttz_text
         |FROM b ORDER BY event_id""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      import graft.functions.TimeFunctions._
      val tod = PgFunctions.timeOfDayMicros($"ts")
      val zoneWest = (-((($"user_id" % 27) - 13) * 1800)).cast("int")
      val ttz = makeTimeTz(tod, zoneWest)
      Tables.T(s, dir).events.filter($"event_id" < 500).select(
        $"event_id", tod.as("tod_us"), zoneWest.as("zone"),
        timetzGmtMicros(ttz).as("gmt_us"),
        timetzZoneNamed(ttz, "America/New_York").getField("t_us")
          .as("ny_us"),
        timetzZoneNamed(ttz, "Australia/Sydney").getField("t_us")
          .as("syd_us"),
        timetzZone(ttz, lit(-19800)).getField("t_us").as("ist_us"),
        timetzText(ttz).as("ttz_text"))
        .orderBy("event_id")
    },

    // Named-zone AT TIME ZONE with real DST (timestamp_zone
    // timestamp.c): zoneinfo lookup across the 2024 US spring-forward /
    // fall-back instants plus a southern-hemisphere zone, over literal
    // edges AND a sweep of real event timestamps. The skipped
    // spring-forward local ('2024-03-10 02:30' never exists in
    // America/New_York) converts identically in both engines (shifted
    // through the gap); AMBIGUOUS fall-back locals are deliberately not
    // driven to UTC — ICU resolves them to the later offset where
    // java.time picks the earlier, a documented engine divergence.
    Q("q_fn_tz_dst", Some(
      """WITH lits(x) AS (VALUES
        |    (TIMESTAMP '2024-03-10 06:59:00'),
        |    (TIMESTAMP '2024-03-10 07:00:00'),
        |    (TIMESTAMP '2024-03-10 02:30:00'),
        |    (TIMESTAMP '2024-11-03 05:59:00'),
        |    (TIMESTAMP '2024-11-03 06:00:00'),
        |    (TIMESTAMP '2024-04-06 16:30:00')),
        |ev AS (SELECT CAST(ts AS TIMESTAMP) AS x FROM events
        |  WHERE event_id < 100),
        |u AS (SELECT x FROM lits UNION ALL SELECT x FROM ev)
        |SELECT x,
        |  timezone('America/New_York', timezone('UTC', x)) AS ny_wall,
        |  timezone('Australia/Sydney', timezone('UTC', x)) AS syd_wall,
        |  timezone('UTC', timezone('America/New_York',
        |    TIMESTAMP '2024-03-10 02:30:00')) AS gap_utc
        |FROM u ORDER BY x""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val lits = Seq("2024-03-10 06:59:00", "2024-03-10 07:00:00",
        "2024-03-10 02:30:00", "2024-11-03 05:59:00",
        "2024-11-03 06:00:00", "2024-04-06 16:30:00")
        .toDF("xs").select($"xs".cast("timestamp").as("x"))
      val ev = Tables.T(s, dir).events.filter($"event_id" < 100)
        .select($"ts".as("x"))
      lits.union(ev).select($"x",
        from_utc_timestamp($"x", "America/New_York").as("ny_wall"),
        from_utc_timestamp($"x", "Australia/Sydney").as("syd_wall"),
        to_utc_timestamp(lit("2024-03-10 02:30:00").cast("timestamp"),
          "America/New_York").as("gap_utc"))
        .orderBy("x")
    },

    // ---- SQL/XML publishing (xml.c:427-726, escape_xml:2285) -------
    // xmlelement + xmlattributes, xmlforest (null drops the element),
    // self-closing empty elements, xmlconcat/xmlcomment/xmlpi, and the
    // escape map (& < > CR, plus " in attributes) — all string-building
    // codegen; oracle spells identical replace chains.
    Q("q_fn_xml", Some(
      """WITH b AS (
        |  SELECT p_partkey, p_brand, p_type, p_size,
        |    replace(replace(replace(replace(p_name,
        |      '&','&amp;'),'<','&lt;'),'>','&gt;'), chr(13),'&#x0d;')
        |      AS e_name,
        |    replace(replace(replace(replace(p_type,
        |      '&','&amp;'),'<','&lt;'),'>','&gt;'), chr(13),'&#x0d;')
        |      AS e_type,
        |    replace(replace(replace(replace(p_name || '<&>' || chr(13),
        |      '&','&amp;'),'<','&lt;'),'>','&gt;'), chr(13),'&#x0d;')
        |      AS esc
        |  FROM part WHERE p_partkey <= 400)
        |SELECT p_partkey,
        |  '<part id="' || CAST(p_partkey AS VARCHAR) || '" brand="'
        |    || replace(replace(replace(replace(replace(p_brand,
        |         '&','&amp;'),'<','&lt;'),'>','&gt;'), chr(13),'&#x0d;'),
        |         '"','&quot;')
        |    || '"><name>' || e_name || '</name><type>' || e_type
        |    || '</type>'
        |    || CASE WHEN p_size % 2 = 0
        |       THEN '<size>' || CAST(p_size AS VARCHAR) || '</size>'
        |       ELSE '' END
        |    || '</part>' AS el,
        |  '<empty id="' || CAST(p_partkey AS VARCHAR) || '"/>'
        |    AS selfclosed,
        |  '<!--c--><?sort ' || p_type || '?>' AS meta,
        |  esc
        |FROM b ORDER BY p_partkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      import graft.functions.XmlFunctions._
      Tables.T(s, dir).part.filter($"p_partkey" <= 400).select(
        $"p_partkey",
        xmlElement("part",
          attrs = Seq("id" -> $"p_partkey", "brand" -> $"p_brand"),
          content = Seq(xmlForest(
            "name" -> $"p_name", "type" -> $"p_type",
            "size" -> when($"p_size" % 2 === 0, $"p_size")))).as("el"),
        xmlElement("empty", attrs = Seq("id" -> $"p_partkey"))
          .as("selfclosed"),
        xmlConcat(xmlComment(lit("c")), xmlPi("sort", $"p_type"))
          .as("meta"),
        escapeContent(concat($"p_name", lit("<&>\r"))).as("esc"))
        .orderBy("p_partkey")
    },

    // xmlagg(fragment ORDER BY key): document aggregation — partial-agg
    // friendly collect/sort/join on the Spark side, string_agg ORDER BY
    // in the oracle.
    // xml_in validation (xml.c wellformed_xml / xml_parse, r8): the
    // malformed-input REJECTION semantics the publishing surface above
    // doesn't cover. Fragments with statically-known validity per
    // key%4: valid element / unclosed tag / bare text (content-valid,
    // document-invalid) / self-closing. The JDK StAX check runs inside
    // codegen (XmlWellFormedExpr); the oracle pins the expected truth
    // table.
    Q("q_fn_xml_valid", Some(
      """WITH x AS (SELECT n_nationkey AS k,
        |  CASE CAST(n_nationkey % 4 AS INT)
        |    WHEN 0 THEN concat('<a href="x">', n_name, '</a>')
        |    WHEN 1 THEN concat('<a>', n_name)
        |    WHEN 2 THEN concat('plain ', n_name, ' text')
        |    ELSE concat('<n k="', CAST(n_nationkey AS VARCHAR), '"/>')
        |  END AS frag
        |  FROM nation)
        |SELECT k, frag,
        |  CASE CAST(k % 4 AS INT) WHEN 1 THEN false ELSE true END
        |    AS wf_content,
        |  CASE CAST(k % 4 AS INT) WHEN 1 THEN false WHEN 2 THEN false
        |    ELSE true END AS wf_doc
        |FROM x ORDER BY k""".stripMargin)) { (s, dir) =>
      import s.implicits._
      Tables.T(s, dir).nation
        .withColumn("frag", expr(
          """CASE CAST(n_nationkey % 4 AS INT)
            |  WHEN 0 THEN concat('<a href="x">', n_name, '</a>')
            |  WHEN 1 THEN concat('<a>', n_name)
            |  WHEN 2 THEN concat('plain ', n_name, ' text')
            |  ELSE concat('<n k="', CAST(n_nationkey AS STRING), '"/>')
            |END""".stripMargin))
        .selectExpr("n_nationkey AS k", "frag",
          "xml_is_well_formed(frag) AS wf_content",
          "xml_is_well_formed_document(frag) AS wf_doc")
        .orderBy("k")
    },

    Q("q_fn_xmlagg", Some(
      """SELECT p_brand,
        |  '<parts>' || string_agg('<p>' || CAST(p_partkey AS VARCHAR)
        |      || '</p>', '' ORDER BY p_partkey) || '</parts>' AS doc,
        |  count(*) AS n
        |FROM part WHERE p_partkey <= 400
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)) { (s, dir) =>
      import s.implicits._
      import graft.functions.XmlFunctions._
      Tables.T(s, dir).part.filter($"p_partkey" <= 400)
        .groupBy($"p_brand")
        .agg(
          concat(lit("<parts>"),
            xmlAgg($"p_partkey",
              concat(lit("<p>"), $"p_partkey".cast("string"), lit("</p>"))),
            lit("</parts>")).as("doc"),
          count(lit(1)).as("n"))
        .orderBy("p_brand")
    },

    // xpath / xpath_exists (xml.c:4243,4340): extraction over documents
    // built from row data — Spark's native UDFXPath family evaluates
    // per-row in the map stage (no shuffle). The oracle computes the
    // same values straight from the source columns, proving round-trip
    // publish→extract fidelity rather than re-running XPath in DuckDB.
    Q("q_fn_xpath", Some(
      """SELECT n_nationkey,
        |  n_name AS name,
        |  CAST(n_regionkey AS BIGINT) AS rk,
        |  CAST(n_nationkey AS VARCHAR) || ',' ||
        |    CAST(n_nationkey * 2 AS VARCHAR) AS ids,
        |  '<i>' || CAST(n_nationkey AS VARCHAR) || '</i>,<i>' ||
        |    CAST(n_nationkey * 2 AS VARCHAR) || '</i>' AS id_nodes,
        |  true AS has_ids,
        |  CAST(n_nationkey AS DOUBLE) / 2 AS halfkey
        |FROM nation ORDER BY n_nationkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      import graft.functions.XmlFunctions._
      val doc = concat(
        lit("<n><name>"), $"n_name",
        lit("</name><rk>"), $"n_regionkey".cast("string"),
        lit("</rk><ids><i>"), $"n_nationkey".cast("string"),
        lit("</i><i>"), ($"n_nationkey" * 2).cast("string"),
        lit("</i></ids><hk>"), ($"n_nationkey".cast("double") / 2),
        lit("</hk></n>"))
      Tables.T(s, dir).nation.select(
        $"n_nationkey",
        xpathString("/n/name", doc).as("name"),
        xpathLong("/n/rk", doc).as("rk"),
        // array output flattened to a joined string: the driver's
        // pandas harness cannot sort array-typed columns (same fix as
        // q_fn_geometric in r4)
        array_join(xpath("/n/ids/i/text()", doc), ",").as("ids"),
        // PG node-set semantics (xml.c:4243 returns xml[] of serialized
        // nodes, not text values): the native xpath_nodes expression
        array_join(graft.expressions.XPathNodesExpr
          .xpathNodes(lit("/n/ids/i"), doc), ",").as("id_nodes"),
        xpathExists("/n/ids", doc).as("has_ids"),
        xpathDouble("/n/hk", doc).as("halfkey"))
        .orderBy("n_nationkey")
    },

    // XMLTABLE (gram.y xmltable / xml.c XmlTableGetValue — the PG10+
    // XML-shredding table function GPDB 7 ships): row expression
    // '/order/line' over a PASSING document, COLUMNS from attribute
    // paths with FOR ORDINALITY. Spark side BUILDS the document (the
    // q_fn_xmlagg shape) and genuinely parses it back — xpath node
    // lists zipped positionally then exploded, one row per matched
    // node. The oracle derives the same rows relationally from
    // lineitem (independent derivation, no XML engine needed).
    Q("q_fn_xmltable", Some(
      """SELECT l_orderkey AS o_key,
        |  CAST(row_number() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_partkey, l_quantity) AS INT) AS ord,
        |  CAST(l_partkey AS VARCHAR) AS partkey,
        |  CAST(CAST(l_quantity AS DOUBLE) AS VARCHAR) AS qty
        |FROM lineitem WHERE l_orderkey < 64
        |ORDER BY o_key, ord""".stripMargin)) { (s, dir) =>
      import s.implicits._
      // build <order><line partkey=".." qty=".."/>...</order> per order;
      // (linenumber, partkey, quantity) pins a NUMERIC total order —
      // the fixture has duplicate linenumbers within an order, and a
      // string-frag tiebreak would sort '1304' before '985'
      val frag = concat(lit("<line partkey=\""),
        $"l_partkey".cast("string"), lit("\" qty=\""),
        $"l_quantity".cast("double").cast("string"), lit("\"/>"))
      val docs = Tables.T(s, dir).lineitem
        .filter($"l_orderkey" < 64)
        .select($"l_orderkey", struct($"l_linenumber", $"l_partkey",
          $"l_quantity", frag.as("f")).as("e"))
        .groupBy($"l_orderkey")
        .agg(concat(lit("<order>"),
          array_join(transform(sort_array(collect_list($"e")),
            x => x.getField("f")), ""),
          lit("</order>")).as("xml"))
      // XMLTABLE('/order/line' PASSING xml COLUMNS ord FOR ORDINALITY,
      //   partkey PATH '@partkey', qty PATH '@qty')
      docs.select($"l_orderkey".as("o_key"),
        expr("xpath(xml, '/order/line/@qty')").as("qtys"),
        posexplode(expr("xpath(xml, '/order/line/@partkey')"))
          .as(Seq("i", "partkey")))
        .select($"o_key", ($"i" + 1).cast("int").as("ord"),
          $"partkey", element_at($"qtys", $"i" + 1).as("qty"))
        .orderBy("o_key", "ord")
    },

    // Oracle-compat functions (gpcontrib/orafce: nvl/nvl2/decode/
    // add_months/last_day/next_day/instr — the compat pack a migrated
    // GP warehouse leans on). Spark ships all of them natively; the
    // oracle spells the PG/ANSI equivalents (COALESCE, CASE, interval
    // month arithmetic with the same end-of-month clamp, isodow
    // arithmetic for next-Monday, 1-based instr).
    // ---- contrib pack: hstore / citext / earthdistance / unaccent /
    // pgcrypto (contrib/hstore/hstore_op.c, citext/citext.c,
    // earthdistance/earthdistance.c, unaccent/unaccent.c,
    // pgcrypto/pgcrypto.c) — each re-expressed on Spark natives; the
    // oracle PARSES/computes the same way, not a copy of the inputs.

    // hstore: 'k=>v' text ⇄ MapType — ->, ?, #keys, akeys. The hstore
    // string is built from real columns then genuinely re-parsed on
    // both sides (str_to_map / split-based list parsing).
    Q("q_fn_hstore", Some(
      """WITH b AS (SELECT doc_id,
        |    'lang=>' || lang || ',source=>' || source || ',n=>'
        |      || CAST(n_chars AS VARCHAR) AS hs
        |  FROM documents WHERE doc_id < 100),
        |p AS (SELECT doc_id, list_transform(string_split(hs, ','),
        |    kv -> string_split(kv, '=>')) AS kvs FROM b)
        |SELECT doc_id,
        |  (list_filter(kvs, kv -> kv[1] = 'lang')[1])[2] AS v_lang,
        |  len(list_filter(kvs, kv -> kv[1] = 'source')) > 0 AS has_source,
        |  CAST(len(kvs) AS INT) AS nkeys,
        |  array_to_string(list_sort(list_transform(kvs, kv -> kv[1])), ',')
        |    AS akeys
        |FROM p ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val hs = concat(lit("lang=>"), $"lang", lit(",source=>"), $"source",
        lit(",n=>"), $"n_chars".cast("string"))
      val h = str_to_map(hs, lit(","), lit("=>"))
      Tables.T(s, dir).documents.filter($"doc_id" < 100)
        .select($"doc_id",
          element_at(h, "lang").as("v_lang"),
          map_contains_key(h, "source").as("has_source"),
          size(h).as("nkeys"),
          concat_ws(",", array_sort(map_keys(h))).as("akeys"))
        .orderBy("doc_id")
    },

    // citext: case-insensitive equality/grouping/DISTINCT — citext's
    // contract is "compare lower(x) under the collation"; a mixed-case
    // fixture joins and groups case-insensitively.
    Q("q_fn_citext", Some(
      """WITH v(name) AS (VALUES ('Alpha'), ('ALPHA'), ('alpha'),
        |  ('Beta'), ('beta'), ('Gamma')),
        |g AS (SELECT lower(name) AS cname, count(*) AS n,
        |    min(name) AS first_spelling
        |  FROM v GROUP BY 1)
        |SELECT cname, n, first_spelling FROM g ORDER BY cname""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        Seq("Alpha", "ALPHA", "alpha", "Beta", "beta", "Gamma").toDF("name")
          .groupBy(lower($"name").as("cname"))
          .agg(count(lit(1)).as("n"), min($"name").as("first_spelling"))
          .orderBy("cname")
    },

    // isn (contrib/isn): EAN-13 check-digit computation/validation and
    // the ISBN-10 check character (mod-11, 'X' for 10) — the product-
    // code algebra behind the contrib's ean13/isbn types, as pure
    // digit arithmetic both engines share. A data-dependent corruption
    // (+partkey%10 on the last payload digit) exercises the validator
    // on mixed pass/fail rows.
    Q("q_fn_isn", Some(
      """WITH c AS (SELECT p_partkey,
        |    '400' || lpad(CAST(p_partkey AS VARCHAR), 9, '0') AS c12
        |  FROM part WHERE p_partkey < 120),
        |d AS (SELECT p_partkey, c12,
        |    (SELECT sum(CAST(substr(c.c12, CAST(i AS INT), 1) AS INT)
        |       * (CASE WHEN i % 2 = 1 THEN 1 ELSE 3 END))
        |     FROM generate_series(1, 12) g(i)) AS wsum
        |  FROM c),
        |e AS (SELECT p_partkey, c12,
        |    (10 - (wsum % 10)) % 10 AS chk FROM d),
        |f AS (SELECT p_partkey,
        |    c12 || CAST(chk AS VARCHAR) AS ean13,
        |    substr(c12, 1, 11)
        |      || CAST((CAST(substr(c12, 12, 1) AS INT) + p_partkey % 10)
        |           % 10 AS VARCHAR)
        |      || CAST(chk AS VARCHAR) AS candidate
        |  FROM e),
        |v AS (SELECT p_partkey, ean13, candidate,
        |    (SELECT sum(CAST(substr(f.candidate, CAST(i AS INT), 1) AS INT)
        |       * (CASE WHEN i % 2 = 1 THEN 1 ELSE 3 END))
        |     FROM generate_series(1, 13) g(i)) % 10 = 0 AS cand_valid
        |  FROM f),
        |i10 AS (SELECT p_partkey,
        |    (SELECT sum(CAST(substr(v.ean13, CAST(i AS INT) + 3, 1) AS INT)
        |       * CAST(i AS INT))
        |     FROM generate_series(1, 9) g(i)) % 11 AS r
        |  FROM v)
        |SELECT v.p_partkey, v.ean13, v.candidate, v.cand_valid,
        |  substr(v.ean13, 4, 9)
        |    || (CASE WHEN i10.r = 10 THEN 'X'
        |        ELSE CAST(i10.r AS VARCHAR) END) AS isbn10
        |FROM v JOIN i10 USING (p_partkey)
        |ORDER BY p_partkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      def wsum13(c: org.apache.spark.sql.Column, n: Int) =
        (1 to n).map { i =>
          substring(c, i, 1).cast("int") * lit(if (i % 2 == 1) 1 else 3)
        }.reduce(_ + _)
      val c12 = concat(lit("400"),
        lpad($"p_partkey".cast("string"), 9, "0"))
      val chk = (lit(10) - (wsum13(c12, 12) % 10)) % 10
      val ean13 = concat(c12, chk.cast("string"))
      val candidate = concat(substring(c12, 1, 11),
        ((substring(c12, 12, 1).cast("int") + $"p_partkey" % 10) % 10)
          .cast("string"),
        chk.cast("string"))
      val candValid = (1 to 13).map { i =>
        substring(candidate, i, 1).cast("int") *
          lit(if (i % 2 == 1) 1 else 3)
      }.reduce(_ + _) % 10 === 0
      val r10 = (1 to 9).map { i =>
        substring(ean13, i + 3, 1).cast("int") * lit(i)
      }.reduce(_ + _) % 11
      Tables.T(s, dir).part.filter($"p_partkey" < 120)
        .select($"p_partkey", ean13.as("ean13"),
          candidate.as("candidate"), candValid.as("cand_valid"),
          concat(substring(ean13, 4, 9),
            when(r10 === 10, "X").otherwise(r10.cast("string")))
            .as("isbn10"))
        .orderBy("p_partkey")
    },

    // earthdistance: great-circle meters via the haversine on the
    // earth() radius (earthdistance.c uses 6378168); both engines spell
    // the identical trig chain; round(1 m) absorbs libm last-ulps.
    Q("q_fn_earthdistance", Some(
      """WITH pts AS (SELECT c_custkey,
        |    (c_custkey % 180) - 90 + 0.5 AS lat,
        |    (c_custkey % 360) - 180 + 0.25 AS lon
        |  FROM customer WHERE c_custkey < 200)
        |SELECT c_custkey,
        |  round(2 * 6378168.0 * asin(sqrt(
        |    pow(sin(radians(lat - 40.7) / 2), 2) +
        |    cos(radians(40.7)) * cos(radians(lat)) *
        |      pow(sin(radians(lon - (-74.0)) / 2), 2))), 1) AS dist_m
        |FROM pts ORDER BY c_custkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val lat = ($"c_custkey" % 180) - 90 + 0.5
      val lon = ($"c_custkey" % 360) - 180 + 0.25
      Tables.T(s, dir).customer.filter($"c_custkey" < 200)
        .select($"c_custkey",
          round(lit(2) * lit(6378168.0) * asin(sqrt(
            pow(sin(radians(lat - 40.7) / 2), 2) +
              cos(radians(lit(40.7))) * cos(radians(lat)) *
                pow(sin(radians(lon - lit(-74.0)) / 2), 2))), 1)
            .as("dist_m"))
        .orderBy("c_custkey")
    },

    // unaccent: diacritic folding as one translate() map (the
    // dictionary-driven contrib reduced to its Latin-1 core).
    Q("q_fn_unaccent", Some(
      """SELECT s,
        |  translate(s, 'àáâãäåèéêëìíîïòóôõöùúûüñçø',
        |    'aaaaaaeeeeiiiiooooouuuunco') AS plain
        |FROM (VALUES ('café'), ('naïve'), ('Señor'), ('Ørsted'),
        |  ('crème brûlée'), ('ASCII only')) v(s)
        |ORDER BY s""".stripMargin)) { (s, dir) =>
      import s.implicits._
      Seq("café", "naïve", "Señor", "Ørsted", "crème brûlée", "ASCII only")
        .toDF("s")
        .select($"s", translate($"s", "àáâãäåèéêëìíîïòóôõöùúûüñçø",
          "aaaaaaeeeeiiiiooooouuuunco").as("plain"))
        .orderBy("s")
    },

    // intarray: &&, @>, |, idx, uniq+sort (contrib/intarray/_int_op.c)
    // over real per-order supplier sets.
    Q("q_fn_intarray", Some(
      """WITH a AS (SELECT l_orderkey,
        |    list_sort(list_distinct(list(l_suppkey))) AS sups
        |  FROM lineitem WHERE l_orderkey < 200 GROUP BY 1)
        |SELECT l_orderkey,
        |  array_to_string(sups, ',') AS sups,
        |  list_has_any(sups, [1, 5, 9]) AS overlaps_159,
        |  list_has_all(sups, [1, 5]) AS contains_15,
        |  CAST(len(list_distinct(list_concat(sups, [1, 5, 9]))) AS INT)
        |    AS union_n,
        |  CAST(coalesce(list_position(sups, 5), 0) AS INT) AS idx5
        |FROM a ORDER BY l_orderkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val probe3 = array(lit(1L), lit(5L), lit(9L))
      Tables.T(s, dir).lineitem.filter($"l_orderkey" < 200)
        .groupBy($"l_orderkey")
        .agg(array_sort(array_distinct(collect_list($"l_suppkey")))
          .as("sups0"))
        .select($"l_orderkey",
          concat_ws(",", $"sups0").as("sups"),
          arrays_overlap($"sups0", probe3).as("overlaps_159"),
          (size(array_except(array(lit(1L), lit(5L)), $"sups0")) === 0)
            .as("contains_15"),
          size(array_union($"sups0", probe3)).as("union_n"),
          array_position($"sups0", 5L).cast("int").as("idx5"))
        .orderBy("l_orderkey")
    },

    // ltree: hierarchical label paths (contrib/ltree/ltree_op.c) —
    // nlevel / subltree / subpath / ancestor `@>` / lca re-expressed as
    // dotted-string algebra over the region→nation hierarchy.
    Q("q_fn_ltree", Some(
      """WITH t AS (SELECT n_nationkey,
        |    'world.' || lower(r_name) || '.' || lower(n_name) AS path
        |  FROM nation JOIN region ON n_regionkey = r_regionkey)
        |SELECT n_nationkey, path,
        |  CAST(len(string_split(path, '.')) AS INT) AS nlevel,
        |  array_to_string(list_slice(string_split(path, '.'), 2, 2), '.')
        |    AS region_label,
        |  starts_with(path, 'world.asia.') OR path = 'world.asia'
        |    AS under_asia,
        |  array_to_string(list_slice(string_split(path, '.'), 1, 2), '.')
        |    AS lca_with_sibling
        |FROM t ORDER BY n_nationkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val t = Tables.T(s, dir).nation
        .join(Tables.T(s, dir).region,
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey",
          concat(lit("world."), lower($"r_name"), lit("."),
            lower($"n_name")).as("path"))
      val parts = split($"path", "\\.")
      t.select($"n_nationkey", $"path",
        size(parts).as("nlevel"),
        concat_ws(".", slice(parts, 2, 1)).as("region_label"),
        ($"path".startsWith("world.asia.") || $"path" === "world.asia")
          .as("under_asia"),
        concat_ws(".", slice(parts, 1, 2)).as("lca_with_sibling"))
        .orderBy("n_nationkey")
    },

    // pgcrypto digest/encode: md5 / sha256 / base64 / hex over a real
    // column (both engines emit uppercase hex).
    Q("q_fn_pgcrypto", Some(
      """SELECT p_partkey, md5(p_name) AS d_md5, sha256(p_name) AS d_sha,
        |  base64(CAST(p_name AS BLOB)) AS b64, hex(p_name) AS hx
        |FROM part WHERE p_partkey < 100 ORDER BY p_partkey""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        Tables.T(s, dir).part.filter($"p_partkey" < 100)
          .select($"p_partkey", md5($"p_name").as("d_md5"),
            sha2($"p_name", 256).as("d_sha"),
            base64($"p_name".cast("binary")).as("b64"),
            hex($"p_name").as("hx"))
          .orderBy("p_partkey")
    },

    Q("q_fn_orafce", Some(
      """SELECT o_orderkey,
        |  o_orderpriority AS nv,
        |  CASE WHEN NULLIF(o_orderpriority, '1-URGENT') IS NOT NULL
        |       THEN 'other' ELSE 'urgent' END AS nv2,
        |  CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished'
        |       WHEN 'P' THEN 'pending' ELSE '?' END AS dec,
        |  CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE)
        |    AS VARCHAR) AS am,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS ld,
        |  CAST(CAST(CAST(o_orderdate AS DATE)
        |    + ((7 - isodow(CAST(o_orderdate AS DATE))) % 7 + 1)
        |      * INTERVAL 1 DAY AS DATE) AS VARCHAR) AS nd,
        |  CAST(instr(o_orderpriority, 'E') AS INT) AS ins
        |FROM orders WHERE o_orderkey <= 600 ORDER BY o_orderkey""".stripMargin)) {
      (s, dir) =>
      Tables.registerAll(s, dir)
      GpSqlDialect.execute(s,
        """SELECT o_orderkey,
          |  nvl(CAST(NULL AS STRING), o_orderpriority) AS nv,
          |  nvl2(NULLIF(o_orderpriority, '1-URGENT'), 'other', 'urgent')
          |    AS nv2,
          |  decode(o_orderstatus, 'O', 'open', 'F', 'finished',
          |    'P', 'pending', '?') AS dec,
          |  CAST(add_months(o_orderdate, 2) AS STRING) AS am,
          |  CAST(last_day(o_orderdate) AS STRING) AS ld,
          |  CAST(next_day(o_orderdate, 'MO') AS STRING) AS nd,
          |  instr(o_orderpriority, 'E') AS ins
          |FROM orders WHERE o_orderkey <= 600 ORDER BY o_orderkey""".stripMargin,
        "/tmp/never")
    },

    // Sparse-vector algebra (gpcontrib/gp_sparse_vector: svec_dot /
    // svec_l2norm / svec_l1norm / svec_plus): embeddings thresholded to
    // COO form, pairwise kernel through the native svec_dot merge loop
    // (one codegen plan node). The oracle spells the same quantities
    // densely with zero-filled terms — adding +0.0 in ascending index
    // order is an exact identity, so the values are bit-equal.
    Q("q_fn_svec", Some {
      def kept(e: String, i: String = "i") =
        s"(CASE WHEN abs(CAST($e[$i] AS DOUBLE)) > 0.15 " +
          s"THEN CAST($e[$i] AS DOUBLE) ELSE 0 END)"
      s"""WITH p AS (SELECT a.vec_id, a.embedding AS ea, b.embedding AS eb
         |  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1)
         |SELECT vec_id,
         |  CAST(len(list_filter(range(1,65),
         |    i -> abs(CAST(ea[i] AS DOUBLE)) > 0.15)) AS INT) AS nnz_a,
         |  round(list_sum(list_transform(range(1,65),
         |    i -> ${kept("ea")} * ${kept("eb")})), 6) AS sdot,
         |  round(sqrt(list_sum(list_transform(range(1,65),
         |    i -> ${kept("ea")} * ${kept("ea")}))), 6) AS l2_a,
         |  round(list_sum(list_transform(range(1,65),
         |    i -> abs(${kept("ea")}))), 6) AS l1_a,
         |  CAST(len(list_filter(range(1,65),
         |    i -> abs(CAST(ea[i] AS DOUBLE)) > 0.15
         |      OR abs(CAST(eb[i] AS DOUBLE)) > 0.15)) AS INT) AS nnz_sum
         |FROM p ORDER BY vec_id""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      import graft.functions.SvecFunctions._
      val emb = Tables.T(s, dir).embeddings
      val pairs = emb.select($"vec_id", $"embedding".as("ea"))
        .join(emb.select(($"vec_id" - 1).as("vec_id"),
          $"embedding".as("eb")), "vec_id")
      val (ai, av) = svecFromDense($"ea", 0.15)
      val (bi, bv) = svecFromDense($"eb", 0.15)
      val (si, _) = svecPlus(ai, av, bi, bv)
      pairs.select(
        $"vec_id",
        svecNnz(ai).as("nnz_a"),
        round(svecDot(ai, av, bi, bv), 6).as("sdot"),
        round(svecL2norm(ai, av), 6).as("l2_a"),
        round(svecL1norm(av), 6).as("l1_a"),
        svecNnz(si).as("nnz_sum"))
        .orderBy("vec_id")
    }
  )
}

/** Fixed metaphone gate vocabulary: every [a-z]+ token the sf0.01
  * documents corpus and part-name word slots produce, with expected
  * codes at maxlen 4 and 8 generated by an independent (non-Scala)
  * replica of the fuzzystrmatch automaton — the two implementations
  * agreeing across the table is the cross-check; the branch-heavy
  * inputs pin separately in ExpressionSpec. */
object MetaphoneVocab {
  val table: Seq[(String, String, String)] = Seq(
    ("a", "A", "A"),
    ("agg", "AK", "AK"),
    ("anvil", "ANFL", "ANFL"),
    ("batch", "BTX", "BTX"),
    ("big", "BK", "BK"),
    ("blue", "BL", "BL"),
    ("bolt", "BLT", "BLT"),
    ("cold", "KLT", "KLT"),
    ("column", "KLMN", "KLMN"),
    ("customer", "KSTM", "KSTMR"),
    ("data", "TT", "TT"),
    ("dup", "TP", "TP"),
    ("fast", "FST", "FST"),
    ("filter", "FLTR", "FLTR"),
    ("gear", "JR", "JR"),
    ("gizmo", "JSM", "JSM"),
    ("group", "KRP", "KRP"),
    ("hash", "HX", "HX"),
    ("hot", "HT", "HT"),
    ("join", "JN", "JN"),
    ("key", "K", "K"),
    ("large", "LRJ", "LRJ"),
    ("line", "LN", "LN"),
    ("merge", "MRJ", "MRJ"),
    ("new", "N", "N"),
    ("old", "OLT", "OLT"),
    ("order", "ORTR", "ORTR"),
    ("part", "PRT", "PRT"),
    ("plate", "PLT", "PLT"),
    ("query", "KR", "KR"),
    ("red", "RT", "RT"),
    ("ring", "RNK", "RNK"),
    ("rod", "RT", "RT"),
    ("row", "R", "R"),
    ("scan", "SKN", "SKN"),
    ("slow", "SL", "SL"),
    ("small", "SML", "SML"),
    ("sort", "SRT", "SRT"),
    ("spark", "SPRK", "SPRK"),
    ("stream", "STRM", "STRM"),
    ("table", "TBL", "TBL"),
    ("the", "0", "0"),
    ("value", "FL", "FL"),
    ("vector", "FKTR", "FKTR"),
    ("widget", "WJT", "WJT"),
    ("window", "WNT", "WNT"))
}

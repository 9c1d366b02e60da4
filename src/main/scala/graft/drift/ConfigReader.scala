package graft.drift

/** Config-file loading — the read half of O42 (the reference entry point is
  * `run_data_drift_detection(config_path)`,
  * /root/reference/data_drift_detector.py:423-435, reading the dialect
  * written by /root/reference/config_generator.py:25-104). [[ConfigGen]]
  * writes the dialect; this parses a file back into a [[DriftRun]] so a user
  * with a config file can drive the engine exactly as the reference is
  * driven. Hand-rolled JSON (no extra deps in this environment). */
object ConfigReader {

  // ------------------------------------------------------------ mini JSON

  sealed trait JVal {
    def apply(key: String): JVal = this match {
      case JObj(f) => f.getOrElse(key, JNull)
      case _ => JNull
    }
    def str: String = this.asInstanceOf[JStr].s
    def num: Double = this.asInstanceOf[JNum].d
    def strOpt: Option[String] = this match { case JStr(s) => Some(s); case _ => None }
    def numOr(d: Double): Double = this match { case JNum(n) => n; case _ => d }
    def boolOr(b: Boolean): Boolean = this match { case JBool(v) => v; case _ => b }
    def boolOpt: Option[Boolean] = this match { case JBool(v) => Some(v); case _ => None }
    def items: Seq[JVal] = this match { case JArr(a) => a; case _ => Seq.empty }
    def fieldsOr: Map[String, JVal] = this match { case JObj(f) => f; case _ => Map.empty }
  }
  case class JObj(fields: Map[String, JVal]) extends JVal
  case class JArr(a: Seq[JVal]) extends JVal
  case class JStr(s: String) extends JVal
  case class JNum(d: Double) extends JVal
  case class JBool(b: Boolean) extends JVal
  case object JNull extends JVal

  def parseJson(s: String): JVal = {
    val p = new Parser(s)
    val v = p.value()
    p.ws()
    require(p.eof, s"trailing content at offset ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def ws(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      require(!eof && s.charAt(pos) == c, s"expected '$c' at offset $pos")
      pos += 1
    }
    def value(): JVal = {
      ws()
      require(!eof, "unexpected end of input")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(string())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case _ => number()
      }
    }
    private def lit(word: String): Unit = {
      require(s.regionMatches(pos, word, 0, word.length), s"bad literal at offset $pos")
      pos += word.length
    }
    private def obj(): JVal = {
      expect('{'); ws()
      val fields = Map.newBuilder[String, JVal]
      if (!eof && s.charAt(pos) == '}') { pos += 1; return JObj(fields.result()) }
      var done = false
      while (!done) {
        ws()
        val k = string()
        ws(); expect(':')
        fields += k -> value()
        ws()
        if (!eof && s.charAt(pos) == ',') pos += 1 else { expect('}'); done = true }
      }
      JObj(fields.result())
    }
    private def arr(): JVal = {
      expect('['); ws()
      val out = Seq.newBuilder[JVal]
      if (!eof && s.charAt(pos) == ']') { pos += 1; return JArr(out.result()) }
      var done = false
      while (!done) {
        out += value()
        ws()
        if (!eof && s.charAt(pos) == ',') pos += 1 else { expect(']'); done = true }
      }
      JArr(out.result())
    }
    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          s.charAt(pos) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              sb += Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
            case other => throw new IllegalArgumentException(s"bad escape \\$other")
          }
        } else sb += c
        pos += 1
      }
      pos += 1
      sb.toString
    }
    private def number(): JVal = {
      val start = pos
      while (!eof && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      JNum(s.substring(start, pos).toDouble)
    }
  }

  // ---------------------------------------------------------- config model

  /** One detection run as described by a config file: where the snapshots
    * live + the [[DriftConfig]] driving the analyzers. `tableFormat`
    * selects the [[graft.drift.SnapshotSource]]: `parquet_dir` (default,
    * bare `v<N>/` directories), `versioned_parquet` (manifest-committed
    * [[graft.drift.VersionedParquetTable]] time travel), or `delta` (on a
    * Delta-enabled deployment). */
  case class DriftRun(tablePath: String, refVersion: Long, currVersion: Long,
      outputTable: Option[String], config: DriftConfig,
      tableFormat: String = "parquet_dir")

  /** Parse the ConfigGen / reference dialect. Unknown keys are ignored;
    * absent keys fall back to the same defaults the reference uses
    * (config_generator.py:25-104). `detect_rare_values` lives inside the
    * selected profile's threshold group in the dialect. */
  def read(json: String): DriftRun = {
    val root = parseJson(json)
    val profile = root("profile").strOpt.getOrElse("standard")
    val profThr = root("thresholds")(profile)
    val config = DriftConfig(
      profile = profile,
      includeColumns = root("include_columns").items.flatMap(_.strOpt),
      excludeColumns = root("exclude_columns").items.flatMap(_.strOpt),
      customColumnTypes = root("custom_column_types").fieldsOr.collect {
        case (k, JStr(v)) => k -> v
      },
      groupColumns = root("group_columns").items.flatMap(_.strOpt),
      targetColumn = root("target_column").strOpt,
      sampleSize = root("sample_size").numOr(100000).toLong,
      analyzeCorrelations = root("analyze_correlations").boolOr(true),
      analyzeGroups = root("analyze_groups").boolOr(true),
      // per-profile threshold-block flags (absent → the profile's own
      // default via DriftConfig's accessors). Effective reference semantics
      // for distributions are two gates ANDed: the top-level flag skips the
      // whole module (data_drift_detector.py:117) and the threshold-block
      // flag skips both halves inside it (distribution_analyzer.py:42,65)
      analyzeDistributionsFlag =
        if (!root("analyze_distributions").boolOr(true)) Some(false)
        else profThr("analyze_distributions").boolOpt,
      detectRareEventsFlag = profThr("detect_rare_values").boolOpt,
      genDistributionSummariesFlag = profThr("gen_distribution_summaries").boolOpt)
    DriftRun(
      tablePath = root("table_path").strOpt.getOrElse(""),
      refVersion = root("reference_version").numOr(0).toLong,
      currVersion = root("current_version").numOr(1).toLong,
      outputTable = root("output_table").strOpt,
      config = config,
      tableFormat = root("table_format").strOpt.getOrElse("parquet_dir"))
  }

  def readFile(path: String): DriftRun =
    read(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}

package graft.core

import java.time._
import java.time.format.DateTimeFormatter
import java.util.UUID
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Version-0 datalake metadata document.
  *
  * Semantics from `client/datalake/common/metadata.py:52-224` of the
  * reference: a validated, normalized description of one archived file.
  * Timestamps are integer **milliseconds since the epoch** throughout (never
  * TimestampType): `start` required, `end` optional (null ⇒ the file is an
  * instant/snapshot), `end >= start` enforced after normalization.
  */
final case class Metadata(
    version: Int,
    start: Long,
    end: Option[Long],
    where: String,
    what: String,
    workId: Option[String],
    path: String,
    id: String,
    hash: String) {

  def toJValue: JValue = JObject(
    "version" -> JInt(version),
    "start" -> JLong(start),
    "end" -> end.map(JLong(_)).getOrElse(JNull),
    "where" -> JString(where),
    "what" -> JString(what),
    "work_id" -> workId.map(JString(_)).getOrElse(JNull),
    "path" -> JString(path),
    "id" -> JString(id),
    "hash" -> JString(hash))

  def json: String = JsonMethods.compact(JsonMethods.render(toJValue))
}

object Metadata {

  val Version = 0

  /** Numbers above this are interpreted as ms, below as seconds
    * (`metadata.py:26-28` MAX_TS_SECONDS heuristic, kept verbatim). */
  val MaxTsSeconds: Double = 100000000000d

  private val SlugRe = "^[a-z0-9_-]+$".r
  private val WindowsAbsRe = "^[a-zA-Z]:\\\\.+".r

  def isSlug(s: String): Boolean = SlugRe.matches(s)

  def isAbsolutePath(p: String): Boolean =
    p.startsWith("/") || WindowsAbsRe.matches(p)

  def newId(): String = UUID.randomUUID().toString.replace("-", "")

  /** Build + validate from loosely-typed fields (mirrors `Metadata.__init__`,
    * `metadata.py:56-77`): assign id if missing, default version, validate
    * required/slug/work_id/path, normalize dates, check interval.
    */
  /** Path translations (`dlfile.py:213-219`): a `where`/`what`/`work_id`
    * VALUE containing '~' is itself a translation expression
    * (`regex~format`, [[Translator]]) applied to the `path` field. The
    * trigger cannot misfire: a literal slug can never contain '~' (the
    * slug charset forbids it), exactly the reference's reasoning. Apply
    * BEFORE [[build]] so the translated value passes slug validation. */
  def applyTranslations(fields: Map[String, Any]): Map[String, Any] = {
    val needed = Seq("where", "what", "work_id").filter(f =>
      fields.get(f).exists(v => v != null && v.toString.contains("~")))
    if (needed.isEmpty) fields
    else {
      val path = fields.get("path").filter(_ != null).map(_.toString)
        .getOrElse(throw new InvalidDatalakeMetadata(
          s""""${needed.head}" is a path translation but "path" is missing"""))
      needed.foldLeft(fields)((acc, f) =>
        acc + (f -> Translator(acc(f).toString).translate(path)))
    }
  }

  def build(fields: Map[String, Any]): Metadata = {
    def opt(k: String): Option[Any] = fields.get(k).filter(_ != null)
    val id = opt("id").map(_.toString).getOrElse(newId())
    val version = opt("version") match {
      case None => Version
      case Some(v: Int) => v
      case Some(v: Long) => v.toInt
      case Some(v: BigInt) => v.toInt
      case Some(v) =>
        try v.toString.toDouble.toInt
        catch {
          case _: NumberFormatException =>
            throw new UnsupportedDatalakeMetadataVersion(
              s"Found version $v. Only $Version is supported")
        }
    }
    // required fields present and non-null (metadata.py:108-115)
    for (f <- Seq("start", "where", "what", "hash", "path"))
      if (opt(f).isEmpty)
        throw new InvalidDatalakeMetadata(s""""$f" is a required field""")
    if (version != Version)
      throw new UnsupportedDatalakeMetadataVersion(
        s"Found version $version. Only $Version is supported")

    val where = opt("where").get.toString
    val what = opt("what").get.toString
    for ((name, v) <- Seq("where" -> where, "what" -> what))
      if (!isSlug(v))
        throw new InvalidDatalakeMetadata(
          s"""Invalid value "$v" for "$name". Only lower-case letters, """ +
            "_ and - are allowed.")

    // work_id is required but may be null (metadata.py:142-152)
    if (!fields.contains("work_id"))
      throw new InvalidDatalakeMetadata(
        """"work_id" is required, but it can be None""")
    val workId = Option(fields("work_id")).map(_.toString)
    workId.foreach { w =>
      if (!isSlug(w))
        throw new InvalidDatalakeMetadata(
          s"""Invalid value "$w" for "work_id". Only lower-case letters, """ +
            "_ and - are allowed.")
      if (w == "null")
        throw new InvalidDatalakeMetadata(
          """"work_id" cannot be the string "null"""")
    }

    val path = opt("path").get.toString
    if (!isAbsolutePath(path))
      throw new InvalidDatalakeMetadata(s"$path is not an absolute path.")

    val start = normalizeDate(opt("start").get)
    val end = opt("end").map(normalizeDate)
    end.foreach { e =>
      if (e < start)
        throw new InvalidDatalakeMetadata(
          """"end" must be greater than "start"""")
    }

    Metadata(version, start, end, where, what, workId, path, id,
      opt("hash").get.toString)
  }

  /** Normalize a polymorphic date input to ms-since-epoch.
    *
    * Mirrors `metadata.py:180-213`: datetime passes through; `"now"` is the
    * current UTC time; numeric values > 1e11 are ms, else seconds; other
    * strings are parsed as (possibly partial) ISO-8601, naive ⇒ UTC.
    */
  def normalizeDate(value: Any): Long = value match {
    case null => throw new InvalidDatalakeMetadata("could not parse a date from null")
    case d: Instant => d.toEpochMilli
    case d: ZonedDateTime => d.toInstant.toEpochMilli
    case d: OffsetDateTime => d.toInstant.toEpochMilli
    case d: LocalDateTime => d.toInstant(ZoneOffset.UTC).toEpochMilli
    case d: LocalDate => d.atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
    case "now" => System.currentTimeMillis()
    case n: Int => fromNumeric(n.toDouble)
    case n: Long => fromNumeric(n.toDouble)
    case n: Double => fromNumeric(n)
    case n: Float => fromNumeric(n.toDouble)
    case n: BigInt => fromNumeric(n.toDouble)
    case n: BigDecimal => fromNumeric(n.toDouble)
    case s: String =>
      // numeric strings first (metadata.py:196-203), then datetime strings
      try fromNumeric(s.toDouble)
      catch {
        case _: NumberFormatException => parseDateTimeString(s)
      }
    case other =>
      throw new InvalidDatalakeMetadata(s"could not parse a date from $other")
  }

  private def fromNumeric(ts0: Double): Long = {
    val ts = if (ts0 > MaxTsSeconds) ts0 / 1000.0 else ts0
    math.round(ts * 1000.0)
  }

  private val localFormats = Seq(
    DateTimeFormatter.ISO_LOCAL_DATE_TIME,
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss[.SSS]"),
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm"))

  /** Tolerant ISO-ish parser standing in for dateutil.parse: offset and
    * zoned forms, local datetimes (assumed UTC), and bare dates. */
  def parseDateTimeString(s: String): Long = {
    val t = s.trim
    def attempt[T](f: => Long): Option[Long] =
      try Some(f) catch { case _: Exception => None }
    val parsed =
      attempt(OffsetDateTime.parse(t).toInstant.toEpochMilli) orElse
        attempt(ZonedDateTime.parse(t).toInstant.toEpochMilli) orElse
        attempt(Instant.parse(t).toEpochMilli) orElse
        localFormats.view.flatMap(fmt =>
          attempt(LocalDateTime.parse(t, fmt)
            .toInstant(ZoneOffset.UTC).toEpochMilli)).headOption orElse
        attempt(LocalDate.parse(t)
          .atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli)
    parsed.getOrElse(
      throw new InvalidDatalakeMetadata(s"Unknown string format: $t"))
  }

  /** ms → ISO-8601 UTC with ms precision and Z suffix (`v0.py:35-63`). */
  def toIso8601(ms: Long): String =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSXX")
      .withZone(ZoneOffset.UTC)
      .format(Instant.ofEpochMilli(ms))

  // ---- JSON codec (json4s ships with Spark) ----

  def fromJValue(j: JValue): Metadata = j match {
    case JObject(kvs) =>
      val m = kvs.toMap.map { case (k, v) => k -> jvalueToAny(v) }
      build(m)
    case _ =>
      throw new InvalidDatalakeMetadata(s"$j is not a JSON object")
  }

  /** Trusted decode for server-produced wire metadata: fields are read
    * verbatim, with NO date re-normalization. `build` re-runs the 1e11
    * seconds/ms heuristic, which silently multiplies an already-normalized
    * epoch-ms value below 1e11 (any pre-March-1973 timestamp) by 1000. The
    * reference client trusts the server's JSON as-is
    * (`archive.py:309-315` `_get_metadata_from_http_url` →
    * `response.json()`), so the wire decode path must too; keep [[build]]
    * for untrusted/loose input only.
    */
  def fromValidatedJValue(j: JValue): Metadata = j match {
    case JObject(kvs) =>
      val m = kvs.toMap
      def str(k: String): String = m.get(k) match {
        case Some(JString(s)) => s
        case other =>
          throw new InvalidDatalakeMetadata(
            s""""$k" missing or not a string in server metadata: $other""")
      }
      def longOpt(k: String): Option[Long] = m.get(k) collect {
        case JInt(i) => i.toLong
        case JLong(l) => l
        case JDouble(d) => math.round(d)
        case JDecimal(d) => d.toLong
      }
      Metadata(
        version = longOpt("version").map(_.toInt).getOrElse(Version),
        start = longOpt("start").getOrElse(
          throw new InvalidDatalakeMetadata(
            """"start" missing in server metadata""")),
        end = longOpt("end"),
        where = str("where"),
        what = str("what"),
        workId = m.get("work_id") collect { case JString(s) => s },
        path = str("path"),
        id = str("id"),
        hash = str("hash"))
    case _ =>
      throw new InvalidDatalakeMetadata(s"$j is not a JSON object")
  }

  def fromJson(s: String): Metadata = {
    if (s == null)
      throw new InvalidDatalakeMetadata("None is not a valid JSON")
    val parsed =
      try JsonMethods.parse(s)
      catch {
        case _: Exception =>
          throw new InvalidDatalakeMetadata(s"$s is not valid json")
      }
    fromJValue(parsed)
  }

  private[core] def jvalueToAny(v: JValue): Any = v match {
    case JNull | JNothing => null
    case JString(s) => s
    case JInt(i) => i
    case JLong(l) => l
    case JDouble(d) => d
    case JDecimal(d) => d
    case JBool(b) => b
    case JArray(xs) => xs.map(jvalueToAny)
    case JObject(kvs) => kvs.toMap.map { case (k, x) => k -> jvalueToAny(x) }
    case JSet(xs) => xs.map(jvalueToAny)
  }
}

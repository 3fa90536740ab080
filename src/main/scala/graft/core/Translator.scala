package graft.core

import java.util.regex.{Matcher, Pattern, PatternSyntaxException}
import scala.collection.mutable

/** Path → slug translator: `'<regex-with-named-groups>~<format>'`.
  *
  * Semantics from `client/datalake/translator.py:24-99`: the extraction
  * regex (with Python named groups) is matched against an absolute path; the
  * format template references groups in braces, e.g.
  * `.*job-(?P<job_id>[0-9]+).log$~job{job_id}` maps
  * `/var/log/jobs/job-1234.log` → `job1234`.
  *
  * Python group names may contain underscores, which Java named groups
  * forbid — so `(?P<name>` markers are stripped to plain capturing groups
  * and resolved by capture index.
  */
final class Translator(translationExpression: String) extends Serializable {

  private val (extractRaw, format) = {
    val tildes = translationExpression.count(_ == '~')
    if (tildes != 1)
      throw new TranslatorError(
        "Translation expression must have exactly one ~ dividing the" +
          "extraction expression from the format expression")
    val Array(e, f) = translationExpression.split("~", 2)
    (e, f)
  }

  /** Regex with `(?P<name>` markers stripped, plus name → capture index. */
  private val (javaRegex, groupIndex) = Translator.rewriteNamedGroups(extractRaw)

  private val pattern: Pattern =
    try Pattern.compile(javaRegex)
    catch {
      case e: PatternSyntaxException => throw new TranslatorError(e.getMessage)
    }

  /** Apply the translation to an absolute path (translator.py:70-99). */
  def translate(path: String): String = {
    if (!Metadata.isAbsolutePath(path))
      throw new TranslatorError(
        s"$path does not appear to be an absolute path")
    val m = pattern.matcher(path)
    if (!m.lookingAt())
      throw new TranslatorError(
        s"""Could not match "$extractRaw" to "$path"""")
    applyFormat(m, path)
  }

  private def applyFormat(m: Matcher, path: String): String = {
    val out = new mutable.StringBuilder
    var i = 0
    while (i < format.length) {
      format.charAt(i) match {
        case '{' =>
          val close = format.indexOf('}', i)
          if (close < 0) throw new TranslatorError("Single '{' in format")
          val name = format.substring(i + 1, close)
          val idx = groupIndex.getOrElse(name,
            throw new TranslatorError(
              s"""Failed to extract "'$name'" from "$path" using "$extractRaw""""))
          out ++= Option(m.group(idx)).getOrElse("")
          i = close + 1
        case '}' => throw new TranslatorError("Single '}' in format")
        case c => out += c; i += 1
      }
    }
    out.result()
  }
}

object Translator {

  def apply(te: String): Translator = new Translator(te)

  /** Strip Python `(?P<name>` group markers, returning the plain regex and a
    * map from group name to capturing-group index (counting ALL capturing
    * groups, named or not, in order — regex semantics). */
  private[core] def rewriteNamedGroups(re: String): (String, Map[String, Int]) = {
    val out = new mutable.StringBuilder
    val names = mutable.Map.empty[String, Int]
    var captureCount = 0
    var i = 0
    var inClass = false
    while (i < re.length) {
      val c = re.charAt(i)
      if (c == '\\' && i + 1 < re.length) {
        out += c += re.charAt(i + 1); i += 2
      } else if (inClass) {
        if (c == ']') inClass = false
        out += c; i += 1
      } else if (c == '[') {
        inClass = true; out += c; i += 1
      } else if (c == '(') {
        if (re.startsWith("(?P<", i)) {
          val close = re.indexOf('>', i + 4)
          if (close < 0) throw new TranslatorError("unterminated group name")
          captureCount += 1
          names(re.substring(i + 4, close)) = captureCount
          out += '('
          i = close + 1
        } else if (re.startsWith("(?", i)) {
          // non-capturing / lookaround / flags — passed through verbatim.
          // Java-style (?<name>) still counts as capturing.
          if (re.startsWith("(?<", i) && close1(re, i + 3) &&
              re.charAt(i + 3) != '=' && re.charAt(i + 3) != '!') {
            captureCount += 1
            val close = re.indexOf('>', i + 3)
            if (close < 0) throw new TranslatorError("unterminated group name")
            names(re.substring(i + 3, close)) = captureCount
          }
          out += c; i += 1
        } else {
          captureCount += 1
          out += c; i += 1
        }
      } else {
        out += c; i += 1
      }
    }
    (out.result(), names.toMap)
  }

  private def close1(re: String, i: Int): Boolean = i < re.length
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The README operator index must track the public `graft.api.Graft`
  * surface: a method added without a row here fails the build, so the
  * docs cannot silently rot. Pure reflection + file read — no Spark. */
class ReadmeIndexSpec extends AnyFunSuite {

  test("every public Graft operator appears in the README operator index") {
    val readme = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
      "UTF-8")
    val begin = readme.indexOf("<!-- graft-operator-index:begin -->")
    val end = readme.indexOf("<!-- graft-operator-index:end -->")
    assert(begin >= 0 && end > begin, "README operator-index markers missing")
    val table = readme.substring(begin, end)
    val methods = graft.api.Graft.getClass.getDeclaredMethods.toSeq
      .filter(m => java.lang.reflect.Modifier.isPublic(m.getModifiers))
      .map(_.getName)
      .filterNot(_.contains("$"))      // defaults, synthetics, lambdas
      .filter(_.head.isLower)          // constants (EmailRe/UrlRe) exempt
      // `private[graft]` is public in bytecode; the repo conventions for
      // package-private members are the *Counted suffix (diagnostic
      // twins) and the *Ctx suffix (shared-derivation variants whose
      // parameter types are themselves package-private)
      .filterNot(_.endsWith("Counted"))
      .filterNot(_.endsWith("Ctx"))
      .distinct.sorted
    assert(methods.size >= 50, s"reflection found only ${methods.size} operators")
    val missing = methods.filterNot(m => table.contains(s"`$m`"))
    assert(missing.isEmpty,
      s"README operator index is missing: ${missing.mkString(", ")}")
    // and every registry query named in the table must actually exist
    val named = "`(q_\\w+)`".r.findAllMatchIn(table).map(_.group(1)).toSet
    val registry = SparkEntry.queries.keySet
    val ghost = named.diff(registry)
    assert(ghost.isEmpty, s"README names unknown registry queries: $ghost")
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Character n-gram language identification (the "n-gram heuristic"
  * of SURVEY's text-analysis extension): cosine similarity between a
  * document's char-trigram frequency vector and small built-in
  * per-language profiles. `q21_text_langid` exposes the SQL-checkable
  * marker-word simplification; this is the real classifier for
  * pipeline use (a UDF by necessity — per-doc hash maps don't
  * decompose into codegen'd expressions; still fully distributed).
  *
  * Profiles are derived at class-load from small embedded seed texts
  * (hand-written samples), so detection is deterministic and
  * dependency-free; swap in corpus-trained profiles for production.
  */
object LangId {

  private val seeds: Map[String, String] = Map(
    "en" -> ("the quick brown fox jumps over the lazy dog and the cat " +
      "this is a test of the language detection system that we are using " +
      "there is no reason why it should not work with enough text for you"),
    "fr" -> ("le chat est sur la table et le chien est dans le jardin " +
      "ceci est un test du système de détection de la langue que nous utilisons " +
      "il n'y a pas de raison que cela ne fonctionne pas avec assez de texte pour vous"),
    "es" -> ("el gato está en la mesa y el perro está en el jardín " +
      "esta es una prueba del sistema de detección de idioma que estamos usando " +
      "no hay razón por la que no funcione con suficiente texto para usted"),
    "de" -> ("die katze sitzt auf dem tisch und der hund ist im garten " +
      "dies ist ein test des spracherkennungssystems das wir verwenden " +
      "es gibt keinen grund warum es nicht mit genug text funktionieren sollte"))

  private def trigrams(text: String): Map[String, Double] = {
    val t = " " + text.toLowerCase.replaceAll("[^\\p{L} ]", " ")
      .replaceAll("\\s+", " ").trim + " "
    if (t.length < 3) return Map.empty
    val counts = t.sliding(3).foldLeft(Map.empty[String, Int]) { (m, g) =>
      m.updated(g, m.getOrElse(g, 0) + 1)
    }
    val norm = math.sqrt(counts.values.map(c => c.toDouble * c).sum)
    counts.map { case (k, v) => k -> v / norm }
  }

  private val profiles: Map[String, Map[String, Double]] =
    seeds.map { case (lang, s) => lang -> trigrams(s) }

  private def cosine(a: Map[String, Double], b: Map[String, Double]): Double =
    if (a.isEmpty || b.isEmpty) 0.0
    else a.iterator.map { case (k, v) => v * b.getOrElse(k, 0.0) }.sum

  /** Best-scoring language, "und" (undetermined) when nothing matches. */
  def detect(text: String): String = {
    if (text == null) return "und"
    val tg = trigrams(text)
    val scored = profiles.toSeq
      .map { case (lang, p) => (lang, cosine(tg, p)) }
      .sortBy { case (lang, score) => (-score, lang) }
    scored.headOption.filter(_._2 > 0.0).map(_._1).getOrElse("und")
  }

  val langIdUdf: Column => Column = {
    val f = udf((s: String) => detect(s))
    c => f(c)
  }
}

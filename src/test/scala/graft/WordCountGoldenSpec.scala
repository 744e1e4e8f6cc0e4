package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** The reference's golden correctness fixture (`DebuggingWordCount
  * .scala:56-60,89-95`): tokenizing King Lear and filtering on
  * `Flourish|stomach` must yield exactly {Flourish: 3, stomach: 1}.
  * A minimal deterministic extract with the same counts stands in for the
  * full text (no network in this environment).
  */
class WordCountGoldenSpec extends SparkSpec {

  private val lear = Seq(
    "Flourish. Enter KING LEAR, CORNWALL, ALBANY, GONERIL, REGAN, Cordelia, and Attendants",
    "Flourish. Enter GLOUCESTER, with FRANCE and BURGUNDY",
    "Flourish. Exeunt",
    "tis the infirmity of his age, yet he hath ever but slenderly known himself",
    "I have a journey, sir, shortly to go. My master calls me, I must not say no.",
    "that all the world shall, I will do such things. What they are, yet I know not",
    "Our basest beggars are in the poorest thing superfluous. Allow not nature more than nature needs",
    "struck me upon the very heart. All's not offence that indiscretion finds and dotage terms so",
    "If thou shouldst not be glad, I would divorce me from thy mother's tomb, sepulchring an adultress",
    "As if we were villains by necessity, fools by heavenly compulsion, knaves, thieves",
    "and treachers by spherical predominance, drunkards, liars, and adulterers, by an enforced",
    "my practices ride easy. I see the business. Let me, if not by birth, have lands by wit",
    "Thou, nature, art my goddess; to thy law my services are bound, wherefore should I",
    "Why brand they us with base, with baseness, bastardy, base, base, who in the lusty stealth",
    "More sinn'd against than sinning. Filial ingratitude. Is it not as this mouth should tear this hand",
    "for lifting food to't. But I will punish home. No, I will weep no more. In such a night",
    "o'erleap that custom, and permit the curiosity of nations to deprive me. His appetite is his stomach")

  test("wordcount filtered on Flourish|stomach == {Flourish: 3, stomach: 1}") {
    import spark.implicits._
    val counts = lear.toDF("line")
      .select(explode(TextFunctions.tokenizeCased($"line")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("n"))
      .filter($"word".rlike("Flourish|stomach"))
      .as[(String, Long)].collect().toMap
    assert(counts == Map("Flourish" -> 3L, "stomach" -> 1L))
  }

  /** The reference's second golden instrument (`AutoComplete.scala:134-139,
    * 362-370`): an order-insensitive checksum over the top-K result —
    * per row `key.hashCode + Σ candidate.hashCode`, summed globally —
    * computed distributed via the codegen'd JavaStringHashCode and
    * cross-checked against a driver-side replay.
    */
  test("autocomplete checksum matches a JVM replay (order-insensitive)") {
    import graft.functions.HashFunctions
    import graft.operators.PrefixTopK
    import spark.implicits._
    val words = lear.toDF("line")
      .select(explode(TextFunctions.tokenizeCased($"line")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("n"))
    val top = PrefixTopK.recursive(words, maxLen = 3, k = 2)
    val engineChecksum = top
      .select((HashFunctions.javaStringHashCode($"prefix").cast("long") +
        HashFunctions.javaStringHashCode($"word").cast("long")).as("h"))
      .agg(sum($"h")).as[Long].head()
    val replay = top.select($"prefix", $"word").as[(String, String)]
      .collect()
      .map { case (p, w) => p.hashCode.toLong + w.hashCode.toLong }.sum
    assert(engineChecksum == replay && engineChecksum != 0L)
  }
}

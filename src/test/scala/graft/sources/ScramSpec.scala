package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** [[ScramClient]] against the published RFC 7677 §3 SCRAM-SHA-256 test
  * vector (user "user", password "pencil", fixed nonces) — every
  * intermediate message must match the RFC byte-for-byte, and the server
  * signature must verify. The live counterpart (a PG 15 cluster flipped to
  * `scram-sha-256` auth) lives in [[LivePgSpec]]. */
class ScramSpec extends AnyFunSuite {

  private val serverFirst =
    "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
      "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"

  private def rfcClient() =
    new ScramClient("pencil", username = "user",
      nonceOverride = Some("rOprNGfwEbeRWgbNEkqO"))

  test("client-first-message matches RFC 7677 vector") {
    assert(rfcClient().clientFirstMessage ===
      "n,,n=user,r=rOprNGfwEbeRWgbNEkqO")
  }

  test("client-final-message (proof) matches RFC 7677 vector") {
    val c = rfcClient()
    assert(c.clientFinalMessage(serverFirst) ===
      "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
        "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
  }

  test("server signature from the RFC vector verifies") {
    val c = rfcClient()
    c.clientFinalMessage(serverFirst)
    c.verifyServerFinal("v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
  }

  test("a forged server signature is rejected") {
    val c = rfcClient()
    c.clientFinalMessage(serverFirst)
    intercept[SecurityException] {
      c.verifyServerFinal("v=AAAATRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
    }
  }

  test("a server nonce that does not extend the client nonce is rejected") {
    val c = rfcClient()
    intercept[SecurityException] {
      c.clientFinalMessage(
        "r=XXXXNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
          "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096")
    }
  }

  test("random-nonce client produces distinct printable nonces") {
    val a = new ScramClient("pw").clientFirstMessage
    val b = new ScramClient("pw").clientFirstMessage
    assert(a !== b)
    val nonce = a.stripPrefix("n,,n=,r=")
    assert(nonce.nonEmpty && !nonce.contains(",") && nonce.forall(ch => ch >= 0x21 && ch <= 0x7e))
  }
}

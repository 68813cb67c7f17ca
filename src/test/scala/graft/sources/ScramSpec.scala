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

  test("channel-bound client (SCRAM-SHA-256-PLUS): gs2 header rides the " +
      "first message and c= carries header+cert-hash (RFC 5802 §6)") {
    val cb = Array[Byte](1, 2, 3, 4)
    val c = new ScramClient("pencil", username = "user",
      nonceOverride = Some("rOprNGfwEbeRWgbNEkqO"),
      gs2Header = "p=tls-server-end-point,,", cbData = cb)
    assert(c.clientFirstMessage ===
      "p=tls-server-end-point,,n=user,r=rOprNGfwEbeRWgbNEkqO")
    val fin = c.clientFinalMessage(serverFirst)
    val expectedC = java.util.Base64.getEncoder.encodeToString(
      "p=tls-server-end-point,,".getBytes("UTF-8") ++ cb)
    assert(fin.startsWith(s"c=$expectedC,r="))
    // the proof differs from the unbound vector: the binding is IN the
    // authenticated message, not a decoration
    assert(!fin.endsWith("p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="))
  }

  test("y-form gs2 (TLS but server offered no -PLUS) encodes c=eSws") {
    val c = new ScramClient("pencil", username = "user",
      nonceOverride = Some("rOprNGfwEbeRWgbNEkqO"), gs2Header = "y,,")
    assert(c.clientFirstMessage.startsWith("y,,n=user,"))
    assert(c.clientFinalMessage(serverFirst).startsWith("c=eSws,r="))
  }

  test("random-nonce client produces distinct printable nonces") {
    val a = new ScramClient("pw").clientFirstMessage
    val b = new ScramClient("pw").clientFirstMessage
    assert(a !== b)
    val nonce = a.stripPrefix("n,,n=,r=")
    assert(nonce.nonEmpty && !nonce.contains(",") && nonce.forall(ch => ch >= 0x21 && ch <= 0x7e))
  }
}

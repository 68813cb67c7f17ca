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

  test("property: mutual authentication against an RFC-faithful server " +
      "verifier over random unicode passwords, salts, and nonces") {
    import java.nio.charset.StandardCharsets.UTF_8
    import javax.crypto.Mac
    import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}
    val b64e = java.util.Base64.getEncoder
    val b64d = java.util.Base64.getDecoder
    def hmac(key: Array[Byte], msg: String): Array[Byte] = {
      val m = Mac.getInstance("HmacSHA256")
      m.init(new SecretKeySpec(key, "HmacSHA256")); m.doFinal(msg.getBytes(UTF_8))
    }
    def h(b: Array[Byte]) = java.security.MessageDigest.getInstance("SHA-256").digest(b)
    val rnd = new scala.util.Random(42)
    def randPassword() = {
      // printable ASCII + some multi-byte code points (NFKC-stable ones)
      val pool = "correct horse battery staple Ωπß館日本語0123!@#".toCharArray
      (0 until (4 + rnd.nextInt(12))).map(_ => pool(rnd.nextInt(pool.length))).mkString
    }
    for (_ <- 1 to 25) {
      val password = randPassword()
      val salt = new Array[Byte](16); rnd.nextBytes(salt)
      val iterations = 64 + rnd.nextInt(512)
      // the server's stored verifier (what CREATE ROLE ... PASSWORD mints)
      val normalized = java.text.Normalizer
        .normalize(password, java.text.Normalizer.Form.NFKC)
      val spec = new PBEKeySpec(normalized.toCharArray, salt, iterations, 256)
      val saltedPassword = javax.crypto.SecretKeyFactory
        .getInstance("PBKDF2WithHmacSHA256").generateSecret(spec).getEncoded
      val storedKey = h(hmac(saltedPassword, "Client Key"))
      val serverKey = hmac(saltedPassword, "Server Key")

      val client = new ScramClient(password)
      val clientFirst = client.clientFirstMessage
      val clientFirstBare = clientFirst.stripPrefix("n,,")
      val serverNonce = clientFirstBare.split("r=", 2)(1) + "SRV" + rnd.nextInt(1 << 20)
      val serverFirst =
        s"r=$serverNonce,s=${b64e.encodeToString(salt)},i=$iterations"
      val clientFinal = client.clientFinalMessage(serverFirst)
      // server verifies the proof: ClientKey = proof XOR ClientSignature,
      // H(ClientKey) must equal StoredKey (RFC 5802 §3)
      val withoutProof = clientFinal.substring(0, clientFinal.lastIndexOf(",p="))
      val proof = b64d.decode(clientFinal.split(",p=", 2)(1))
      val authMessage = s"$clientFirstBare,$serverFirst,$withoutProof"
      val clientSig = hmac(storedKey, authMessage)
      val clientKey = proof.zip(clientSig).map { case (a, b) => (a ^ b).toByte }
      assert(java.util.Arrays.equals(h(clientKey), storedKey),
        s"proof failed for password '$password' i=$iterations")
      // and the client accepts the genuine server signature, rejects a fake
      client.verifyServerFinal(
        "v=" + b64e.encodeToString(hmac(serverKey, authMessage)))
      val wrong = new ScramClient(password + "x")
      val wrongBare = wrong.clientFirstMessage.stripPrefix("n,,")
      val wrongServerFirst = // same salt/iterations, the wrong client's nonce
        s"r=${wrongBare.split("r=", 2)(1)}SRV2," +
          s"s=${b64e.encodeToString(salt)},i=$iterations"
      val wf = wrong.clientFinalMessage(wrongServerFirst)
      val wProof = b64d.decode(wf.split(",p=", 2)(1))
      val wAuth = s"$wrongBare,$wrongServerFirst," +
        wf.substring(0, wf.lastIndexOf(",p="))
      val wKey = wProof.zip(hmac(storedKey, wAuth)).map { case (a, b) => (a ^ b).toByte }
      assert(!java.util.Arrays.equals(h(wKey), storedKey),
        "a wrong-password proof must not verify")
    }
  }

  test("random-nonce client produces distinct printable nonces") {
    val a = new ScramClient("pw").clientFirstMessage
    val b = new ScramClient("pw").clientFirstMessage
    assert(a !== b)
    val nonce = a.stripPrefix("n,,n=,r=")
    assert(nonce.nonEmpty && !nonce.contains(",") && nonce.forall(ch => ch >= 0x21 && ch <= 0x7e))
  }

  test("tls-server-end-point hash selection: classic names by substring, " +
      "RSASSA-PSS by its DER parameters (r5-advice low)") {
    import java.security.spec.{MGF1ParameterSpec, PSSParameterSpec}
    def pssDer(digest: String, mgfSpec: MGF1ParameterSpec, saltLen: Int): Array[Byte] = {
      val ap = java.security.AlgorithmParameters.getInstance("RSASSA-PSS")
      ap.init(new PSSParameterSpec(digest, "MGF1", mgfSpec, saltLen, 1))
      ap.getEncoded
    }
    // classic JCA names: the hash is in the name (MD5/SHA-1 map UP per RFC 5929)
    assert(PgWireConnection.certHashAlg("SHA256withRSA", null) === "SHA-256")
    assert(PgWireConnection.certHashAlg("SHA384withECDSA", null) === "SHA-384")
    assert(PgWireConnection.certHashAlg("SHA512withRSA", null) === "SHA-512")
    assert(PgWireConnection.certHashAlg("SHA1withRSA", null) === "SHA-256")
    assert(PgWireConnection.certHashAlg("MD5withRSA", null) === "SHA-256")
    // PSS certs report the bare algorithm; the hash lives in the parameters —
    // a substring match alone bound a PSS/SHA-384 cert to SHA-256 and the
    // -PLUS proof failed verification against such servers
    assert(PgWireConnection.certHashAlg("RSASSA-PSS",
      pssDer("SHA-384", MGF1ParameterSpec.SHA384, 48)) === "SHA-384")
    assert(PgWireConnection.certHashAlg("RSASSA-PSS",
      pssDer("SHA-512", MGF1ParameterSpec.SHA512, 64)) === "SHA-512")
    assert(PgWireConnection.certHashAlg("RSASSA-PSS",
      pssDer("SHA-256", MGF1ParameterSpec.SHA256, 32)) === "SHA-256")
    // SHA-1-parameterized PSS maps up, per the RFC floor
    assert(PgWireConnection.certHashAlg("RSASSA-PSS",
      pssDer("SHA-1", MGF1ParameterSpec.SHA1, 20)) === "SHA-256")
    // SHA-224 is NOT mapped up: RFC 5929 lifts only MD5/SHA-1, and the
    // server (be_tls_get_certificate_hash) digests with the cert's own
    // algorithm — binding with SHA-256 would mismatch
    assert(PgWireConnection.certHashAlg("SHA224withRSA", null) === "SHA-224")
    assert(PgWireConnection.certHashAlg("RSASSA-PSS",
      pssDer("SHA-224", MGF1ParameterSpec.SHA224, 28)) === "SHA-224")
    // dash-bearing provider spellings resolve too (matching is
    // dash-stripped on BOTH the classic-name and PSS-parameter paths)
    assert(PgWireConnection.certHashAlg("SHA-384withRSA", null) === "SHA-384")
    assert(PgWireConnection.certHashAlg("SHA-512WITHECDSA", null) === "SHA-512")
    // unresolvable parameters fall back to the floor, not an exception
    assert(PgWireConnection.certHashAlg("RSASSA-PSS", Array[Byte](0x30, 0x00)) === "SHA-256")
    assert(PgWireConnection.certHashAlg("RSASSA-PSS", null) === "SHA-256")
  }

  test("tls-server-end-point hash selection: SHA3 families bind as " +
      "themselves; digest-less algorithms floor to SHA-256 (r6-advice low)") {
    // be_tls_get_certificate_hash digests with the cert's OWN algorithm —
    // a SHA3-256 cert must bind with SHA3-256, and SHA3 names must not be
    // swallowed by the SHA-2 substring matches after dash-stripping
    // ("SHA3-256withRSA" → "SHA3256WITHRSA")
    assert(PgWireConnection.certHashAlg("SHA3-224withRSA", null) === "SHA3-224")
    assert(PgWireConnection.certHashAlg("SHA3-256withRSA", null) === "SHA3-256")
    assert(PgWireConnection.certHashAlg("SHA3-384withECDSA", null) === "SHA3-384")
    assert(PgWireConnection.certHashAlg("SHA3-512withRSA", null) === "SHA3-512")
    // truncated SHA-512/t certs bind as themselves — the bare SHA512
    // substring must not swallow them (review finding: a SHA-512/256 cert
    // bound with SHA-512 and, having matched a SHA-2 substring, never
    // logged the mismatch)
    assert(PgWireConnection.certHashAlg("SHA512/224withRSA", null) === "SHA-512/224")
    assert(PgWireConnection.certHashAlg("SHA512/256withRSA", null) === "SHA-512/256")
    assert(PgWireConnection.certHashAlg("SHA-512/256WITHECDSA", null) === "SHA-512/256")
    // every selected algorithm must be a MessageDigest this JVM can compute
    Seq("SHA3-224", "SHA3-256", "SHA3-384", "SHA3-512",
        "SHA-512/224", "SHA-512/256").foreach { a =>
      java.security.MessageDigest.getInstance(a)
    }
    // Ed25519/Ed448 carry no digest the server could match (PostgreSQL
    // itself errors for these certs) — we floor to SHA-256 (and log), so
    // the worst case is a diagnosable bind failure, never a crash
    assert(PgWireConnection.certHashAlg("Ed25519", null) === "SHA-256")
    assert(PgWireConnection.certHashAlg("Ed448", null) === "SHA-256")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Freeze guard for the codec surface (r14 verdict #4) — the sibling of
  * [[ParityFreezeSpec]]. `Vp8/Jpeg/Flac/Multimodal` are ~10k LoC of
  * hash-green decode logic (VP8 key+inter, VP8L, animated GIF/WebP,
  * PNG incl. Adam7, TIFF, JPEG baseline+progressive, FLAC, MP3/Ogg
  * census) plus their in-repo fixture encoders. No pipeline requirement
  * will change them; this pin makes an ACCIDENTAL edit fail `sbt test`
  * immediately instead of surfacing as a gate drift a round later.
  *
  * A DELIBERATE codec change is still possible — re-run OpsSpec +
  * PropertySpec (incl. the ImageIO cross-validation tests) and update
  * the pinned hash here in the same commit. The failure message prints
  * the new hash so that update is copy-paste.
  */
class CodecFreezeSpec extends AnyFunSuite {

  private val pinned = Map(
    "src/main/scala/graft/ops/Vp8.scala" ->
      "e6a55840b08576a274607a6dbbc46a3d03f640d31369e0844c3e28f4980bd81e",
    "src/main/scala/graft/ops/Jpeg.scala" ->
      "8d08f9baddec942278b7751f8f2425bff899516eeb1bcb76cbceeefcd259c0c6",
    "src/main/scala/graft/ops/Flac.scala" ->
      "6959f932db25dc804aafabf824d9d8af6e846c2849139c73f025c013f04f68c7",
    // repinned r17: rename-only change — the phash-family bucket-policy
    // parameter maxBucket -> starCap (advisor finding: the same name
    // meant the DROP policy in Dedup/Neutral but the STAR policy here);
    // no logic or literal changed, OpsSpec + PropertySpec re-run green
    // in the same commit. (Prior r16 repin: star-capped degree defaults
    // and the posting-list star cap + exact match-count verify join in
    // videoNearDups.)
    "src/main/scala/graft/ops/Multimodal.scala" ->
      "68cf78ed983d3ce283c1c393cd076888d78b91a5bc8a60dbf6486186bc7c7b92")

  private def sha256(path: java.nio.file.Path): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(java.nio.file.Files.readAllBytes(path))
      .map("%02x".format(_)).mkString
  }

  test("codec sources are byte-identical to the cross-validated versions " +
      "(deliberate changes must re-run OpsSpec/PropertySpec AND this pin)") {
    for ((rel, want) <- pinned) {
      val p = java.nio.file.Paths.get(rel)
      assert(java.nio.file.Files.exists(p),
        s"codec source $rel missing — run from the repo root")
      val got = sha256(p)
      assert(got == want,
        s"$rel changed (sha256 $got, pinned $want). If deliberate: re-run " +
          "OpsSpec + PropertySpec (incl. ImageIO cross-validation) and " +
          "update the pin in CodecFreezeSpec.")
    }
  }
}

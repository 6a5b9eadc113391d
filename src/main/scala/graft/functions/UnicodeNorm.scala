package graft.functions

import java.text.Normalizer
import org.apache.spark.unsafe.types.UTF8String

/** Static forwarder for the codegen'd NFC expression ([[NfcNormalize]]),
  * mirroring [[Hashes]]/[[GazetteUuid]]: generated code calls a plain
  * static method, keeping the expression inside whole-stage codegen.
  */
object UnicodeNorm {
  /** Unicode NFC over a UTF8String. Already-normalized input (all of
    * ASCII, hence most corpus text) returns the SAME object —
    * `isNormalized` has a Latin-1 fast path, so the common case costs a
    * scan, not a decode + re-encode + allocation.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

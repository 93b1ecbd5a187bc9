package graft.multimodal

/** Boundary guard for the decoder tier's loud-reject contract: deep
  * index arithmetic over a TORN input can surface as the quiet-crash
  * classes (index errors, negative allocations, division on a
  * corrupted field) before any semantic `require` sees the problem.
  * At a decoder's public entry those are the same fact — the input is
  * torn — so they convert to the contract's IllegalArgumentException
  * with the cause preserved. Errors (OOM, StackOverflow) and the
  * already-loud classes pass through untouched: this wrapper narrows
  * HOW a reject is reported, never WHETHER a problem is reported.
  * (DecoderFuzzSpec drives every decoder through seeded corruption to
  * hold the contract.)
  */
private[graft] object Torn {
  def guard[T](format: String)(body: => T): T =
    try body
    catch {
      case e: IndexOutOfBoundsException =>
        throw new IllegalArgumentException(
          s"torn $format: ${e.getMessage}", e)
      case e: NegativeArraySizeException =>
        throw new IllegalArgumentException(
          s"torn $format: negative allocation (${e.getMessage})", e)
      case e: ArithmeticException =>
        throw new IllegalArgumentException(
          s"torn $format: ${e.getMessage}", e)
      case e: NumberFormatException =>
        throw new IllegalArgumentException(
          s"torn $format: ${e.getMessage}", e)
    }
}

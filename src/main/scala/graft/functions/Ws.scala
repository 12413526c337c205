package graft.functions

/** The Java-regex `\s` character class, shared by every split-parity
  * kernel (CollapseWs, TokenStats, CountTokensInSet, CountAlphaTokens).
  * This is THE character set the whole split/trim replication contract
  * hangs on — it lives in exactly one place so a future change cannot
  * silently desynchronize the dedup key, tokenCount, stopwordRatio and
  * the Gopher alpha rule from each other. */
private[functions] object Ws {
  @inline def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 11.toChar /* \x0B */ ||
      c == '\f' || c == '\r'
}

package graft.queries

/** DuckDB fragments replicating `graft.functions.Fnv` exactly — the
  * FNV-1a fold in unsigned HUGEINT space with the XOR decomposed onto
  * the low byte (valid because FNV's XOR operand is always < 256):
  * `h ^ b = h - h%256 + xor(h%256, b)`. Same verified pattern as the
  * mm02 checksum oracle; validated against an independent mirror on the
  * sf0.01 corpus (d04: 25/25 pairs, d05: 17/17 pairs exact).
  */
private[queries] object FnvSql {

  /** `(acc, x) -> next` FNV-1a step for `list_reduce`. */
  val fold: String =
    "(acc, x) -> ((acc - acc % 256 + xor((acc % 256)::BIGINT, x::BIGINT)::HUGEINT)" +
      " * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT"

  /** FNV-1a of a string expression's UTF-8 bytes (bytes via hex() —
    * ord() would give codepoints). Unsigned HUGEINT result.
    */
  def ofString(e: String): String =
    s"""list_reduce(
       |  list_prepend(14695981039346656037::HUGEINT,
       |    list_transform(range(octet_length(encode($e))), i ->
       |      ((strpos('0123456789ABCDEF', hex(encode($e))[2*i+1])-1)*16 +
       |       (strpos('0123456789ABCDEF', hex(encode($e))[2*i+2])-1))::HUGEINT)),
       |  $fold)""".stripMargin

  /** `Fnv.hashPerm(seed, h)`: FNV-1a over 4 LE seed bytes + 8 LE hash
    * bytes. `seed` is a small int expression, `hu` an unsigned HUGEINT.
    */
  def perm(seed: String, hu: String): String =
    s"""list_reduce(
       |  list_prepend(14695981039346656037::HUGEINT,
       |    [ ($seed % 256)::HUGEINT, (($seed // 256) % 256)::HUGEINT,
       |      (($seed // 65536) % 256)::HUGEINT, (($seed // 16777216) % 256)::HUGEINT,
       |      ($hu % 256), (($hu // 256) % 256), (($hu // 65536) % 256),
       |      (($hu // 16777216) % 256), (($hu // 4294967296) % 256),
       |      (($hu // 1099511627776) % 256), (($hu // 281474976710656) % 256),
       |      (($hu // 72057594037927936) % 256) ]),
       |  $fold)""".stripMargin

  /** FNV-1a state after folding only the 4 LE seed bytes from the
    * offset basis — the per-permutation PREFIX, independent of the
    * hashed key. FNV is a sequential fold, so
    * `perm(seed, hu) = permTail(permPrefix(seed), hu)` exactly;
    * precomputing the prefix once per seed (e.g. 32 rows) removes a
    * third of the fold steps from a seeds×keys permutation table.
    */
  def permPrefix(seed: String): String =
    s"""list_reduce(
       |  list_prepend(14695981039346656037::HUGEINT,
       |    [ ($seed % 256)::HUGEINT, (($seed // 256) % 256)::HUGEINT,
       |      (($seed // 65536) % 256)::HUGEINT, (($seed // 16777216) % 256)::HUGEINT ]),
       |  $fold)""".stripMargin

  /** Continue the FNV-1a fold from a precomputed prefix state `acc0`
    * over the 8 LE bytes of the unsigned-HUGEINT `hu`.
    */
  def permTail(acc0: String, hu: String): String =
    s"""list_reduce(
       |  list_prepend($acc0,
       |    [ ($hu % 256), (($hu // 256) % 256), (($hu // 65536) % 256),
       |      (($hu // 16777216) % 256), (($hu // 4294967296) % 256),
       |      (($hu // 1099511627776) % 256), (($hu // 281474976710656) % 256),
       |      (($hu // 72057594037927936) % 256) ]),
       |  $fold)""".stripMargin

  /** Unsigned HUGEINT -> signed BIGINT (two's-complement wrap). */
  def toSigned(e: String): String =
    s"""CAST(CASE WHEN $e >= 9223372036854775808::HUGEINT
       |  THEN $e - 18446744073709551616::HUGEINT ELSE $e END AS BIGINT)""".stripMargin
}

package graft.server

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.SparkSession

/** An authenticated caller: `role` is `reader` (SELECT only) or
  * `writer` (DML allowed). */
final case class Principal(name: String, role: String) {
  require(AuthStore.Roles.contains(role),
    s"unknown role '$role' — expected one of ${AuthStore.Roles.mkString(", ")}")
  def canWrite: Boolean = role == AuthStore.Writer
}

/** Bearer-token store for the HTTP surface. The reference keeps its
  * auth records in an RDBMS; the lake-native equivalent is a small
  * parquet table of `(token_sha256, principal, role)` — tokens are
  * hashed at rest, so neither the store file nor a heap dump ever
  * holds a credential in the clear. Lookup is by SHA-256 digest, so
  * an attacker who can time map lookups still has to invert the hash
  * to learn a token.
  *
  * The store is immutable and loaded once at server construction —
  * token rotation is a file rewrite plus server restart, matching the
  * scale of this surface (a query front-end, not an IdP).
  */
final class AuthStore private (byHash: Map[String, Principal]) {

  def size: Int = byHash.size

  /** Resolve an `Authorization: Bearer <token>` header value. Returns
    * None for a missing header, a non-Bearer scheme, or an unknown
    * token — the server maps all three to 401. */
  def authenticate(header: Option[String]): Option[Principal] =
    header.map(_.trim)
      .filter(_.regionMatches(true, 0, "Bearer ", 0, 7))
      .map(h => AuthStore.sha256Hex(h.drop(7).trim))
      .flatMap(byHash.get)
}

object AuthStore {
  val Reader = "reader"
  val Writer = "writer"
  val Roles: Set[String] = Set(Reader, Writer)

  def sha256Hex(token: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(token.getBytes(UTF_8))
      .map(b => f"$b%02x").mkString

  /** Build a store from plaintext tokens (hashed immediately; the
    * plaintext map is not retained). */
  def apply(tokens: Map[String, Principal]): AuthStore =
    new AuthStore(tokens.map { case (t, p) => sha256Hex(t) -> p })

  /** Build from already-hashed rows (what [[load]] reads). */
  def fromHashed(rows: Seq[(String, Principal)]): AuthStore =
    new AuthStore(rows.toMap)

  /** Persist plaintext tokens as a hashed-at-rest parquet table.
    * Deliberately single-file (coalesce(1)): auth tables are tiny and
    * read whole at startup. */
  def save(spark: SparkSession, path: String,
           tokens: Map[String, Principal]): Unit = {
    import spark.implicits._
    tokens.toSeq.map { case (t, p) => (sha256Hex(t), p.name, p.role) }
      .toDF("token_sha256", "principal", "role")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a store written by [[save]] (or any conforming table). A
    * malformed role fails loudly here, at startup, not at first
    * request. */
  def load(spark: SparkSession, path: String): AuthStore = {
    val rows = spark.read.parquet(path)
      .select("token_sha256", "principal", "role")
      .collect()
      .map(r => r.getString(0) -> Principal(r.getString(1), r.getString(2)))
    fromHashed(rows.toSeq)
  }
}

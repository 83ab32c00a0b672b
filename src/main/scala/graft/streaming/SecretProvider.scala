package graft.streaming

import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Connector-credential resolution, the Spark-native equivalent of the
  * reference's `get_secret()` (/root/reference/main.py:31-54): fetch a named
  * secret, parse its JSON payload into a string→string config map, and feed
  * it to the source configuration — always on the driver, before any
  * stream starts (/root/reference/main.py:71 does the same at module scope,
  * before pipeline construction).
  *
  * The reference's backend is AWS Secrets Manager over the network
  * (`main.py:33-36`); in this zero-egress engine the trait gets environment
  * and file backends (SURVEY §2.1 row "secret-backed connector config").
  * The reference's 5-branch error taxonomy (`main.py:38-47`) collapses to
  * the single meaningful distinction at this layer: resolvable or not —
  * surfaced as a typed failure instead of a printed-and-swallowed one
  * (`main.py:111-112`).
  */
trait SecretProvider {

  /** Raw payload for `name`, or None if the secret does not exist. */
  def fetch(name: String): Option[String]

  /** Fetch + JSON-parse into a flat config map (the reference's
    * `json.loads(get_secret())`, main.py:71). Non-string JSON values are
    * rendered compactly, mirroring how Kafka client configs treat every
    * value as a string. */
  def fetchConfig(name: String): Map[String, String] = {
    val raw = fetch(name).getOrElse(
      throw new NoSuchElementException(s"secret not found: $name"))
    JsonMethods.parse(raw) match {
      case JObject(fields) =>
        fields.map {
          case (k, JString(v)) => k -> v
          case (k, v)          => k -> JsonMethods.compact(JsonMethods.render(v))
        }.toMap
      case other =>
        throw new IllegalArgumentException(
          s"secret $name is not a JSON object: ${other.getClass.getSimpleName}")
    }
  }
}

/** Secrets from environment variables: name `a.b-c` → env `A_B_C`. */
class EnvSecretProvider(env: Map[String, String] = sys.env)
    extends SecretProvider {
  override def fetch(name: String): Option[String] =
    env.get(name.toUpperCase.replaceAll("[^A-Z0-9]", "_"))
}

/** Secrets from files under a root directory: name → `<root>/<name>.json`. */
class FileSecretProvider(root: String) extends SecretProvider {
  override def fetch(name: String): Option[String] = {
    val p = Paths.get(root, s"$name.json")
    if (Files.isReadable(p)) Some(Files.readString(p)) else None
  }
}

/** In-memory provider for tests. */
class StaticSecretProvider(secrets: Map[String, String])
    extends SecretProvider {
  override def fetch(name: String): Option[String] = secrets.get(name)
}

/** First-match chain, so deployments can layer env over files. */
class ChainedSecretProvider(providers: Seq[SecretProvider])
    extends SecretProvider {
  override def fetch(name: String): Option[String] =
    providers.view.flatMap(_.fetch(name)).headOption
}

package graft.social

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.model.Graphid

/** REST facade over [[SocialGraph]] — the analogue of the reference's
  * Axum service (social-network-api/src/main.rs:61-108 route table),
  * served by the JDK's built-in HttpServer so the library adds no
  * dependency; bodies are JSON via Jackson (already on Spark's
  * classpath). Identifiers are numeric user/post KEYS — this store keys
  * vertices by packed numeric ids where the reference keys users by
  * username; a naming divergence, not a semantic one (every route,
  * verb, status code and response shape maps 1:1).
  *
  * Routes (user key = `{u}`, post key = `{p}`):
  * {{{
  * GET    /health
  * POST   /api/v1/users                        {"key":1,"username":"u1"}
  * GET    /api/v1/users/{u}
  * PUT    /api/v1/users/{u}                    {"username":"new"}
  * DELETE /api/v1/users/{u}
  * POST   /api/v1/users/{u}/follow/{target}    [{"at":123}]
  * DELETE /api/v1/users/{u}/follow/{target}
  * GET    /api/v1/users/{u}/followers
  * GET    /api/v1/users/{u}/following
  * GET    /api/v1/users/{u}/suggested-friends[?k=10]
  * GET    /api/v1/users/{u}/network?target={u2}
  * GET    /api/v1/users/{u}/timeline[?limit=20]
  * POST   /api/v1/posts                        {"key":9,"user":1,"content":"…","at":5}
  * GET    /api/v1/posts/{p}
  * DELETE /api/v1/posts/{p}
  * POST   /api/v1/posts/{p}/like               {"user":1,"at":7}
  * DELETE /api/v1/posts/{p}/like?user=1
  * GET    /api/v1/posts/{p}/likes
  * }}}
  *
  * The serving layer is a DEV/TEST surface: one Spark driver answering
  * point queries carries the documented OLTP-latency non-goal
  * (BASELINE.md) — the value here is API-shape parity. At scale these
  * composites run as batch/streaming jobs, not a request loop.
  */
final class SocialGraphService(graph: SocialGraph, port: Int = 0) {

  private val mapper = new ObjectMapper()
  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))

  def boundPort: Int = server.getAddress.getPort
  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)

  private def key(id: Long): Long = Graphid.unpack(id)._2

  private def handle(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val path = ex.getRequestURI.getPath
    val query = Option(ex.getRequestURI.getQuery).getOrElse("")
      .split("&").filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
    val resp: (Int, ObjectNode) =
      try route(method, path.split("/").filter(_.nonEmpty).toList, query,
        ex.getRequestBody.readAllBytes())
      catch {
        // NumberFormatException (bad path/query numbers) included
        case e: IllegalArgumentException =>
          err(400, Option(e.getMessage).getOrElse("bad request"))
        case e: Exception => err(500, Option(e.getMessage).getOrElse("error"))
      }
    val bytes = mapper.writeValueAsBytes(resp._2)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(resp._1, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def err(code: Int, msg: String): (Int, ObjectNode) = {
    val n = mapper.createObjectNode(); n.put("error", msg); (code, n)
  }
  private def ok(n: ObjectNode): (Int, ObjectNode) = (200, n)
  private def obj(kvs: (String, Any)*): ObjectNode = {
    val n = mapper.createObjectNode()
    kvs.foreach {
      case (k, v: String) => n.put(k, v)
      case (k, v: Long) => n.put(k, v)
      case (k, v: Int) => n.put(k, v)
      case (k, v: Boolean) => n.put(k, v)
      case (k, v: JsonNode) => n.set(k, v); ()
      case (k, v) => n.put(k, String.valueOf(v))
    }
    n
  }
  private def arr(xs: Iterable[JsonNode]): ArrayNode = {
    val a = mapper.createArrayNode(); xs.foreach(a.add); a
  }
  private def longs(xs: Iterable[Long]): ArrayNode = {
    val a = mapper.createArrayNode(); xs.foreach(a.add); a
  }
  private def body(raw: Array[Byte]): JsonNode =
    if (raw.isEmpty) mapper.createObjectNode()
    else mapper.readTree(new String(raw, StandardCharsets.UTF_8))
  private def jLong(j: JsonNode, field: String): Long = {
    val f = j.get(field)
    require(f != null && f.canConvertToLong, s"missing numeric field '$field'")
    f.asLong()
  }

  /** One route per reference endpoint (main.rs:61-108). */
  private def route(method: String, segs: List[String],
      query: Map[String, String], raw: Array[Byte]): (Int, ObjectNode) =
    (method, segs) match {
      case ("GET", "health" :: Nil) => ok(obj("status" -> "ok"))

      // —— users ——
      case ("POST", "api" :: "v1" :: "users" :: Nil) =>
        val j = body(raw)
        val k = jLong(j, "key")
        val name = Option(j.get("username")).map(_.asText()).getOrElse("")
        if (graph.createUser(k, name))
          (201, obj("key" -> k, "username" -> name))
        else err(409, s"user $k exists")
      case ("GET", "api" :: "v1" :: "users" :: u :: Nil) =>
        graph.getUser(u.toLong)
          .map(name => ok(obj("key" -> u.toLong, "username" -> name)))
          .getOrElse(err(404, s"user $u not found"))
      case ("PUT", "api" :: "v1" :: "users" :: u :: Nil) =>
        val name = Option(body(raw).get("username")).map(_.asText()).getOrElse("")
        if (graph.updateUser(u.toLong, name))
          ok(obj("key" -> u.toLong, "username" -> name))
        else err(404, s"user $u not found")
      case ("DELETE", "api" :: "v1" :: "users" :: u :: Nil) =>
        if (graph.deleteUser(u.toLong)) ok(obj("deleted" -> u.toLong))
        else err(404, s"user $u not found")

      // —— social graph ——
      case ("POST", "api" :: "v1" :: "users" :: u :: "follow" :: t :: Nil) =>
        val at = Option(body(raw).get("at")).map(_.asLong())
          .getOrElse(System.currentTimeMillis())
        if (graph.follow(u.toLong, t.toLong, at))
          ok(obj("follower" -> u.toLong, "followee" -> t.toLong))
        else err(404, s"user $u or $t not found")
      case ("DELETE", "api" :: "v1" :: "users" :: u :: "follow" :: t :: Nil) =>
        graph.unfollow(u.toLong, t.toLong)
        ok(obj("follower" -> u.toLong, "followee" -> t.toLong))
      case ("GET", "api" :: "v1" :: "users" :: u :: "followers" :: Nil) =>
        val rows = graph.followers(u.toLong).collect()
          .map(r => obj("key" -> key(r.getLong(0)), "at" -> r.getLong(1)))
        ok(obj("followers" -> arr(rows)))
      case ("GET", "api" :: "v1" :: "users" :: u :: "following" :: Nil) =>
        val rows = graph.following(u.toLong).collect()
          .map(r => obj("key" -> key(r.getLong(0)), "at" -> r.getLong(1)))
        ok(obj("following" -> arr(rows)))
      case ("GET", "api" :: "v1" :: "users" :: u :: "suggested-friends" :: Nil) =>
        val k = query.get("k").map(_.toInt).getOrElse(10)
        val rows = graph.suggestFriends(u.toLong, k).collect()
          .map(r => obj("key" -> key(r.getLong(0)), "paths" -> r.getLong(1)))
        ok(obj("suggestions" -> arr(rows)))
      case ("GET", "api" :: "v1" :: "users" :: u :: "network" :: Nil) =>
        val target = query.getOrElse("target",
          return err(400, "missing ?target=")).toLong
        val (path, degrees, mutual) = graph.networkAnalysis(u.toLong, target)
        ok(obj("path" -> longs(path),
          "degrees_of_separation" -> degrees.map(_.toLong).getOrElse(-1L),
          "mutual_friends" -> longs(mutual)))
      case ("GET", "api" :: "v1" :: "users" :: u :: "timeline" :: Nil) =>
        val limit = query.get("limit").map(_.toInt).getOrElse(20)
        val rows = graph.timeline(u.toLong, limit)
          .select("post_id", "content", "created_at").collect()
          .map(r => obj("post" -> key(r.getLong(0)),
            "content" -> r.getString(1), "at" -> r.getLong(2)))
        ok(obj("timeline" -> arr(rows)))

      // —— posts ——
      case ("POST", "api" :: "v1" :: "posts" :: Nil) =>
        val j = body(raw)
        val (pk, uk) = (jLong(j, "key"), jLong(j, "user"))
        val content = Option(j.get("content")).map(_.asText()).getOrElse("")
        val at = Option(j.get("at")).map(_.asLong())
          .getOrElse(System.currentTimeMillis())
        if (graph.getUser(uk).isEmpty) // reference checks the author first
          err(404, s"user $uk not found") // (content.rs:38) — no orphan post
        else if (graph.createPost(uk, pk, content, at))
          (201, obj("key" -> pk, "user" -> uk))
        else err(409, s"post $pk exists")
      case ("GET", "api" :: "v1" :: "posts" :: p :: Nil) =>
        graph.getPost(p.toLong).map { case (content, at, author) =>
          ok(obj("key" -> p.toLong, "content" -> content, "at" -> at,
            "author" -> author.getOrElse(-1L)))
        }.getOrElse(err(404, s"post $p not found"))
      case ("DELETE", "api" :: "v1" :: "posts" :: p :: Nil) =>
        if (graph.deletePost(p.toLong)) ok(obj("deleted" -> p.toLong))
        else err(404, s"post $p not found")
      case ("POST", "api" :: "v1" :: "posts" :: p :: "like" :: Nil) =>
        val j = body(raw)
        val u = jLong(j, "user")
        val at = Option(j.get("at")).map(_.asLong())
          .getOrElse(System.currentTimeMillis())
        if (graph.likePost(u, p.toLong, at))
          ok(obj("post" -> p.toLong, "user" -> u))
        else err(404, s"user $u or post $p not found")
      case ("DELETE", "api" :: "v1" :: "posts" :: p :: "like" :: Nil) =>
        val u = query.getOrElse("user", return err(400, "missing ?user=")).toLong
        graph.unlikePost(u, p.toLong)
        ok(obj("post" -> p.toLong, "user" -> u))
      case ("GET", "api" :: "v1" :: "posts" :: p :: "likes" :: Nil) =>
        val rows = graph.postLikes(p.toLong).collect()
          .map(r => obj("key" -> key(r.getLong(0)), "at" -> r.getLong(1)))
        ok(obj("likes" -> arr(rows)))

      case _ => err(404, s"no route: $method /${segs.mkString("/")}")
    }
}

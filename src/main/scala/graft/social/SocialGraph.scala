package graft.social

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algorithms.{Direction, Traversals}
import graft.model.Graphid
import graft.store.GraphStore

/** The reference's social-network workload (SURVEY.md §2.8,
  * /root/reference/social-network-api) as a typed Scala API over a
  * GraphStore: User vertices, FOLLOWS edges, Post vertices + POSTED edges.
  * Every operation is a DataFrame transform — follow/unfollow are the M1/M3
  * mutation patterns, the read ops are the C2-C6 composite queries.
  */
final class SocialGraph(spark: SparkSession, initial: GraphStore) {
  @volatile var store: GraphStore = initial

  /** Mutations since the last lineage compaction. Each follow/unfollow
    * wraps FOLLOWS in another union/anti-join; compacting every
    * `CompactEvery` mutations keeps per-op planning time flat over long
    * mutation sequences (SocialGraphSpec pins the bounded-plan invariant).
    */
  private var mutationsSinceCompact = 0
  val CompactEvery = 16

  private def afterMutation(next: GraphStore): Unit = {
    mutationsSinceCompact += 1
    store =
      if (mutationsSinceCompact >= CompactEvery) {
        mutationsSinceCompact = 0
        next.compact()
      } else next
  }

  val UserLab = 200
  val PostLab = 201
  val FollowsLab = 210
  val PostedLab = 211

  private def follows: DataFrame = store.edgeTables.getOrElse("FOLLOWS",
    spark.emptyDataFrame.withColumn("id", lit(0L)).withColumn("src", lit(0L))
      .withColumn("dst", lit(0L)).withColumn("followed_at", lit(0L)).limit(0))

  def userId(k: Long): Long = Graphid.pack(UserLab, k)

  /** C1 follow: dup-check (anti-join) then edge insert — the reference's
    * check-then-create (social_graph.rs:21-49) without the read loop.
    */
  /** 48-bit mix of an ordered pair (splitmix64 finalizer). Edge ids only
    * need identity-uniqueness; a 48-bit hash is collision-safe to ~2^24
    * edges (birthday bound) — bulk ingestion goes through GraphIO's
    * partition-offset allocation instead, this path is the OLTP-ish
    * single-edge API.
    */
  private def pairId48(a: Long, b: Long): Long = {
    var x = a * 0x9E3779B97F4A7C15L + b
    x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
    x ^= (x >>> 27); x *= 0x94D049BB133111EBL
    x ^= (x >>> 31)
    x & Graphid.LocalMask
  }

  def follow(followerKey: Long, followeeKey: Long, at: Long): Boolean =
    // both endpoints must exist — the reference 404s a dangling follow
    // (social_graph.rs:40-44); false here maps to the handler's 404
    getUser(followerKey).nonEmpty && getUser(followeeKey).nonEmpty && {
      import spark.implicits._
      val row = Seq((Graphid.pack(FollowsLab, pairId48(followerKey, followeeKey)),
        userId(followerKey), userId(followeeKey), at))
        .toDF("id", "src", "dst", "followed_at")
      val existing = follows
      val fresh = row.join(existing.select(col("src").as("esrc"), col("dst").as("edst")),
        col("src") === col("esrc") && col("dst") === col("edst"), "left_anti")
      afterMutation(store.withEdgeTable("FOLLOWS", existing.unionByName(fresh)))
      true
    }

  /** C1 unfollow: anti-join delete (social_graph.rs:52-73). */
  def unfollow(followerKey: Long, followeeKey: Long): Unit = {
    val kept = follows.where(
      !(col("src") === userId(followerKey) && col("dst") === userId(followeeKey)))
    afterMutation(store.withEdgeTable("FOLLOWS", kept))
  }

  /** C2 following / followers: one-hop expansion + limit. */
  def following(userKey: Long, limit: Int = 100): DataFrame =
    follows.where(col("src") === userId(userKey))
      .select(col("dst").as("user_id"), col("followed_at"))
      .orderBy(col("followed_at").desc, col("user_id")).limit(limit)

  def followers(userKey: Long, limit: Int = 100): DataFrame =
    follows.where(col("dst") === userId(userKey))
      .select(col("src").as("user_id"), col("followed_at"))
      .orderBy(col("followed_at").desc, col("user_id")).limit(limit)

  /** C3 mutual friends: intersection of the two following sets
    * (social_graph.rs:138-163).
    */
  def mutualFriends(aKey: Long, bKey: Long): DataFrame = {
    val fa = follows.where(col("src") === userId(aKey)).select(col("dst").as("user_id"))
    val fb = follows.where(col("src") === userId(bKey)).select(col("dst").as("user_id"))
    fa.intersect(fb).orderBy(col("user_id"))
  }

  /** C4 friend suggestion: friends-of-friends minus self and
    * already-followed, scored by path count, top-k
    * (services/social_graph.rs:81-122).
    */
  def suggestFriends(userKey: Long, k: Int = 10): DataFrame = {
    val me = userId(userKey)
    val f = follows.select(col("src"), col("dst"))
    val mine = f.where(col("src") === me).select(col("dst").as("friend"))
    val fof = mine.join(f, col("friend") === f("src"))
      .select(col("dst").as("candidate"))
      .where(col("candidate") =!= me)
    fof.join(mine.withColumnRenamed("friend", "candidate"), Seq("candidate"), "left_anti")
      .groupBy(col("candidate")).agg(count(lit(1)).as("paths"))
      .orderBy(col("paths").desc, col("candidate"))
      .limit(k)
  }

  /** C5 degrees of separation: BFS shortest path over FOLLOWS. */
  def degreesOfSeparation(aKey: Long, bKey: Long, maxHops: Int = 6): Option[Int] = {
    val d = Traversals.shortestPathDist(
      follows.select(col("src"), col("dst")), userId(aKey), userId(bKey), maxHops,
      Direction.Out).collect()
    d.headOption.map(_.getInt(1))
  }

  /** C5 with the connecting path, like the reference's social API surfaces
    * (services/social_graph.rs + shortest_path.rs:144-174): the
    * lexicographically-minimal shortest FOLLOWS chain a → … → b as user
    * keys, or None if unconnected within maxHops.
    */
  def connectionPath(aKey: Long, bKey: Long, maxHops: Int = 6): Option[Seq[Long]] = {
    val rows = Traversals.shortestPath(
      follows.select(col("src"), col("dst")), userId(aKey), userId(bKey), maxHops,
      Direction.Out).collect()
    rows.headOption.map(_.getSeq[Long](3).map(Graphid.unpack(_)._2))
  }

  // ——— user / post / like CRUD: the reference repository layer
  // (social-network-api handlers/{user,post}.rs) re-expressed as the same
  // dup-checked anti-join inserts and filter deletes the C1 ops use ———

  val LikesLab = 212

  def postId(k: Long): Long = Graphid.pack(PostLab, k)

  private def emptyTable(cols: (String, org.apache.spark.sql.Column)*): DataFrame =
    cols.foldLeft(spark.emptyDataFrame) { case (df, (n, c)) =>
      df.withColumn(n, c) }.limit(0)

  private def users: DataFrame = store.vertexTables.getOrElse("User",
    emptyTable("id" -> lit(0L), "username" -> lit("")))
  private def posts: DataFrame = store.vertexTables.getOrElse("Post",
    emptyTable("id" -> lit(0L), "content" -> lit(""), "created_at" -> lit(0L)))
  private def posted: DataFrame = store.edgeTables.getOrElse("POSTED",
    emptyTable("id" -> lit(0L), "src" -> lit(0L), "dst" -> lit(0L)))
  private def likes: DataFrame = store.edgeTables.getOrElse("LIKES",
    emptyTable("id" -> lit(0L), "src" -> lit(0L), "dst" -> lit(0L),
      "liked_at" -> lit(0L)))

  /** create_user (handlers/user.rs): dup-checked insert; false = key
    * taken (the reference's 409 conflict).
    */
  def createUser(key: Long, username: String): Boolean = {
    import spark.implicits._
    if (getUser(key).nonEmpty) false
    else {
      val row = Seq((userId(key), username)).toDF("id", "username")
      afterMutation(store.withVertexTable("User", users.unionByName(row)))
      true
    }
  }

  def getUser(key: Long): Option[String] =
    users.where(col("id") === userId(key)).select(col("username"))
      .collect().headOption.map(_.getString(0))

  /** update_user: rewrite the username column on the matching row. */
  def updateUser(key: Long, username: String): Boolean =
    getUser(key).nonEmpty && {
      val upd = users.withColumn("username",
        when(col("id") === userId(key), lit(username)).otherwise(col("username")))
      afterMutation(store.withVertexTable("User", upd)); true
    }

  /** delete_user DETACHES: the vertex row and every FOLLOWS/POSTED/LIKES
    * edge touching it leave in ONE store swap (the reference cascades
    * through its repository; an atomic swap needs no cascade order).
    * The user's posts survive authorless — the reference keeps them too.
    */
  def deleteUser(key: Long): Boolean =
    getUser(key).nonEmpty && {
      val me = userId(key)
      var next = store.withVertexTable("User", users.where(col("id") =!= me))
      if (store.edgeTables.contains("FOLLOWS"))
        next = next.withEdgeTable("FOLLOWS",
          follows.where(col("src") =!= me && col("dst") =!= me))
      if (store.edgeTables.contains("POSTED"))
        next = next.withEdgeTable("POSTED", posted.where(col("src") =!= me))
      if (store.edgeTables.contains("LIKES"))
        next = next.withEdgeTable("LIKES", likes.where(col("src") =!= me))
      afterMutation(next); true
    }

  /** create_post (handlers/post.rs): Post vertex + POSTED edge in one
    * swap; false = post key taken.
    */
  def createPost(userKey: Long, postKey: Long, content: String,
      at: Long): Boolean = {
    import spark.implicits._
    if (getPost(postKey).nonEmpty) false
    else {
      val pid = postId(postKey)
      val v = Seq((pid, content, at)).toDF("id", "content", "created_at")
      val e = Seq((Graphid.pack(PostedLab, pairId48(userKey, postKey)),
        userId(userKey), pid)).toDF("id", "src", "dst")
      afterMutation(store
        .withVertexTable("Post", posts.unionByName(v))
        .withEdgeTable("POSTED", posted.unionByName(e)))
      true
    }
  }

  /** (content, created_at, author user key) — author via the POSTED edge. */
  def getPost(postKey: Long): Option[(String, Long, Option[Long])] = {
    val pid = postId(postKey)
    posts.where(col("id") === pid)
      .join(posted.select(col("src").as("author"), col("dst")),
        col("id") === col("dst"), "left")
      .select(col("content"), col("created_at"), col("author"))
      .collect().headOption
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(Graphid.unpack(r.getLong(2))._2)))
  }

  def deletePost(postKey: Long): Boolean =
    getPost(postKey).nonEmpty && {
      val pid = postId(postKey)
      var next = store.withVertexTable("Post", posts.where(col("id") =!= pid))
      if (store.edgeTables.contains("POSTED"))
        next = next.withEdgeTable("POSTED", posted.where(col("dst") =!= pid))
      if (store.edgeTables.contains("LIKES"))
        next = next.withEdgeTable("LIKES", likes.where(col("dst") =!= pid))
      afterMutation(next); true
    }

  /** like_post: dup-checked LIKES edge user→post (idempotent, like
    * follow); unlike filters it back out.
    */
  def likePost(userKey: Long, postKey: Long, at: Long): Boolean =
    // user AND post must exist — the reference 404s a dangling like
    // (services/content.rs existence lookups); false maps to 404
    getUser(userKey).nonEmpty && getPost(postKey).nonEmpty && {
      import spark.implicits._
      val row = Seq((Graphid.pack(LikesLab, pairId48(userKey, postKey)),
        userId(userKey), postId(postKey), at))
        .toDF("id", "src", "dst", "liked_at")
      val fresh = row.join(
        likes.select(col("src").as("esrc"), col("dst").as("edst")),
        col("src") === col("esrc") && col("dst") === col("edst"), "left_anti")
      afterMutation(store.withEdgeTable("LIKES", likes.unionByName(fresh)))
      true
    }

  def unlikePost(userKey: Long, postKey: Long): Unit = {
    val kept = likes.where(
      !(col("src") === userId(userKey) && col("dst") === postId(postKey)))
    afterMutation(store.withEdgeTable("LIKES", kept))
  }

  /** get_post_likes: who liked, newest first. */
  def postLikes(postKey: Long, limit: Int = 100): DataFrame =
    likes.where(col("dst") === postId(postKey))
      .select(col("src").as("user_id"), col("liked_at"))
      .orderBy(col("liked_at").desc, col("user_id")).limit(limit)

  /** analyze_network (models/social.rs:13-17 NetworkAnalysis): the
    * connecting path, its length, and the mutual-friend set — composed
    * from the C3/C5 operators.
    */
  def networkAnalysis(aKey: Long, bKey: Long, maxHops: Int = 6)
      : (Seq[Long], Option[Int], Seq[Long]) = {
    val path = connectionPath(aKey, bKey, maxHops).getOrElse(Seq.empty)
    val degrees = if (path.isEmpty) None else Some(path.size - 1)
    val mutual = mutualFriends(aKey, bKey).collect()
      .map(r => Graphid.unpack(r.getLong(0))._2).toSeq
    (path, degrees, mutual)
  }

  /** C6 timeline: posts of followed users, newest first
    * (services/content.rs:65-100). posts: (id, src=user, dst=post) POSTED +
    * Post vertices with created_at.
    */
  def timeline(userKey: Long, limit: Int = 20): DataFrame = {
    // no posts yet → the TYPED empty timeline (a column-less frame would
    // blow up schema-driven consumers like the REST facade)
    if (!store.edgeTables.contains("POSTED") ||
        !store.vertexTables.contains("Post")) {
      import spark.implicits._
      return Seq.empty[(Long, Long, String, Long)]
        .toDF("post_id", "author", "content", "created_at")
    }
    val posted = store.edgeTables("POSTED")
    val posts = store.vertexTables("Post")
    follows.where(col("src") === userId(userKey))
      .select(col("dst").as("author"))
      .join(posted.select(col("src").as("author"), col("dst").as("post_id")), "author")
      .join(posts.select(col("id").as("post_id"), col("content"), col("created_at")), "post_id")
      .orderBy(col("created_at").desc, col("post_id"))
      .limit(limit)
  }
}

package graft

/** Curated-shaped fixture rows for search-side specs. */
object TestFixtures {
  case class TH(text: String)
  case class Ents(hashtags: Seq[TH])
  case class Tw(
      id_str: String, user_id: String, text: String, created_at: String,
      lang: String, favorite_count: Long, retweet_count: Long, entities: Ents)
  case class U(
      id: String, name: String, screen_name: String, location: String,
      description: String, verified: Boolean, followers_count: Long,
      friends_count: Long, created_at: java.sql.Timestamp)

  val tweets: Seq[Tw] = Seq(
    Tw("1", "u1", "Stay Home stay safe", "Sun Apr 12 16:48:01 +0000 2020", "en", 50, 10, Ents(Seq(TH("StayHome")))),
    Tw("2", "u1", "the house is big", "Mon Apr 13 10:00:00 +0000 2020", "en", 5, 20, Ents(Seq(TH("corona")))),
    Tw("3", "u2", "casa grande aqui", "Tue Apr 14 11:30:00 +0000 2020", "es", 5, 20, Ents(Seq(TH("corona"), TH("casa")))),
    Tw("4", "u3", "nothing to see", "Wed Apr 15 09:15:00 +0000 2020", "en", 1, 1, Ents(Seq())),
    Tw("5", "u2", "White House briefing", "Thu Apr 16 20:45:00 +0000 2020", "en", 100, 3, Ents(Seq(TH("politics")))))

  val users: Seq[U] = Seq(
    U("u1", "Alice", "alice", "NY", "dev", verified = true, 1000, 50, java.sql.Timestamp.valueOf("2019-01-01 00:00:00")),
    U("u2", "Bob", "bob", "SF", "ops", verified = false, 5000, 10, java.sql.Timestamp.valueOf("2018-05-05 00:00:00")),
    U("u3", "Carol", "carol", "LA", "pm", verified = false, 10, 2, java.sql.Timestamp.valueOf("2020-02-02 00:00:00")))
}

package graft

/** Public facade — the analog of the reference's `datasplash.api`
  * namespace (api.clj:29-125), which re-exports every operator under
  * one roof. Scala users can import the member objects or use these
  * stable aliases.
  */
object api {
  val session: GraftSession.type = GraftSession
  val transforms: operators.Transforms.type = operators.Transforms
  val combiners: operators.Combiners.type = operators.Combiners
  val grouping: operators.Grouping.type = operators.Grouping
  val side: operators.SideArtifacts.type = operators.SideArtifacts
  val io: sources.GraftIO.type = sources.GraftIO
  val schema: sources.SchemaDsl.type = sources.SchemaDsl
  val windows: streaming.Windows.type = streaming.Windows
  val stateful: streaming.Stateful.type = streaming.Stateful
  val streams: streaming.Sources.type = streaming.Sources
  val dedup: functions.Dedup.type = functions.Dedup
  val similarity: functions.Similarity.type = functions.Similarity
  val text: functions.TextFunctions.type = functions.TextFunctions
  val multimodal: functions.Multimodal.type = functions.Multimodal
}

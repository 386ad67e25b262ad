package graft.operators

/** Central registry of every operator exposed through the driver
  * contract (SparkEntry). Each group file contributes a `Seq[Q]`;
  * names must be globally unique (asserted at class-load so a clash
  * fails fast in tests rather than silently shadowing a map key).
  */
object Registry {
  val all: Seq[Q] =
    RelationalQueries.all ++
      EventStoreQueries.all ++
      TextDedupQueries.all ++
      CorpusQueries.all ++
      IncrementalDedup.all ++
      EmbIncrementalDedup.all ++
      DocSearchIndex.all ++
      BpeTokenizer.all ++
      QualityClassifier.all ++
      LayoutQueries.all ++
      TrigramIndex.all ++
      EmbeddingQueries.all ++
      MultimodalQueries.all

  require(all.map(_.name).distinct.size == all.size,
    "duplicate query names in Registry")

  private lazy val index: Map[String, Q] = all.map(q => q.name -> q).toMap
  def byName(name: String): Q = index(name)
}

package graft

/** Collapse-aware `bench_ref.json` refresh:
  *
  *   sbt "runMain graft.BenchRef <newArtifact> <priorQuietArtifact> [refPath]"
  *
  * Replaces the ad-hoc "copy query_cpu into the ref" snippet that
  * poisoned the round-10 reference: that refresh (a) trusted every
  * ratio of the source run, so a transient host window's collapsed
  * ratios became the reference and disabled the trigger for exactly
  * the queries the window hit, and (b) HARDCODED `"cpus":32` even
  * though the source run had executed at the local[4] default.
  *
  * This tool instead: takes the new ratios through
  * [[Bench.refreshRef]] (a query whose new wall time exceeds 2x the
  * prior quiet artifact's wall is collapse-suspect — its reference
  * never lowers), writes the `cpus` the source artifact actually
  * recorded, and refuses artifacts that are env-flagged, carry
  * errors, or predate the `cpus` provenance field.
  */
object BenchRef {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BenchRef <newArtifact.json> <priorQuietArtifact.json> [refPath]")
    val refPath = if (args.length >= 3) args(2) else "bench_ref.json"
    def read(p: String) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p)), "UTF-8")
    val next = read(args(0))
    val prior = read(args(1))
    require(!next.contains("\"env_flagged\":true"),
      s"${args(0)} is env_flagged — refusing to refresh the reference from it")
    require(next.contains("\"errors\":[]"),
      s"${args(0)} carries query errors — refusing")
    val cpus = "\"cpus\":\\s*([0-9]+)".r.findFirstMatchIn(next)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(
        s"${args(0)} records no cpus field — artifacts predating the " +
          "provenance fix cannot seed the reference (their parallelism " +
          "is unknowable)"))
    val newCpu = Bench.scrapeObj(next, "query_cpu")
    val newWall = Bench.scrapeObj(next, "queries")
    val priorWall = Bench.scrapeObj(prior, "queries")
    require(newCpu.nonEmpty && newWall.nonEmpty,
      s"${args(0)} has no query_cpu/queries objects")
    val oldRef = Bench.loadCpuRef(refPath, cpus)
    val merged = Bench.refreshRef(oldRef, newCpu, newWall, priorWall)
    val protectedQs = merged.keys.filter(q =>
      merged(q) != newCpu(q)).toSeq.sorted
    val body = merged.toSeq.sortBy(_._1)
      .map { case (q, r) => "\"" + q + "\":" + (math.rint(r * 1000) / 1000) }
      .mkString(",")
    java.nio.file.Files.write(java.nio.file.Paths.get(refPath),
      (s"""{"cpus":$cpus,"query_cpu":{$body}}""" + "\n").getBytes("UTF-8"))
    val triggerable = merged.count(_._2 >= Bench.cpuRefFloor)
    println(s"[bench-ref] wrote $refPath: ${merged.size} entries at cpus=$cpus, " +
      s"$triggerable trigger-able (>= ${Bench.cpuRefFloor})")
    if (protectedQs.nonEmpty)
      println(s"[bench-ref] collapse-suspect (reference kept at max(old,new)): " +
        protectedQs.mkString(", "))
  }
}

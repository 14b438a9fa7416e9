package graft

import java.nio.file.{Files, Paths}

import graft.mr.MapReduce

class MapReduceSpec extends SparkSpec {
  import spark.implicits._

  test("keyOf: first comma field; no comma → whole line") {
    assert(MapReduce.keyOf("a,b,c") == "a")
    assert(MapReduce.keyOf("nocomma") == "nocomma")
    assert(MapReduce.keyOf(",leading") == "")
  }

  test("WRITE/READ roundtrip preserves line ORDER and partition count") {
    val tmp = Files.createTempDirectory("graft-mr").toString
    val src = s"$tmp/input.txt"
    // deliberately NOT in lexicographic order: catches a sorted-merge
    // masquerading as manifest-order reassembly
    val lines = scala.util.Random.shuffle((1 to 100).toList)
      .map(i => s"line$i,payload$i")
    Files.write(Paths.get(src), String.join("\n", lines: _*).getBytes)
    MapReduce.write(spark, src, s"$tmp/dfs", partitions = 7)
    val parts = new java.io.File(s"$tmp/dfs").listFiles()
      .count(_.getName.startsWith("part-"))
    assert(parts == 7)
    val back = MapReduce.read(spark, s"$tmp/dfs").collect()
    assert(back.sameElements(lines),
      "READ must reassemble chunks in manifest order (original line order)")
  }

  test("CLI: -w/-r roundtrip in order, -mr pipe writes <name>_out") {
    val tmp = Files.createTempDirectory("graft-cli")
    sys.props("graft.dfs") = tmp.resolve("dfs").toString
    try {
      val src = tmp.resolve("corpus.txt")
      val lines = Seq("b b", "a b", "c", "a b")
      // no trailing newline in the source: -r must roundtrip byte-for-byte
      Files.write(src, lines.mkString("\n").getBytes)
      Cli.run(spark, Array("-w", src.toString))
      val dest = tmp.resolve("back.txt")
      Cli.run(spark, Array("-r", "corpus", dest.toString))
      assert(Files.readAllBytes(dest).sameElements(Files.readAllBytes(src)))
      // newline-terminated source roundtrips byte-for-byte too
      val srcNl = tmp.resolve("corpus_nl.txt")
      Files.write(srcNl, lines.mkString("", "\n", "\n").getBytes)
      Cli.run(spark, Array("-w", srcNl.toString, "corpus_nl"))
      val destNl = tmp.resolve("back_nl.txt")
      Cli.run(spark, Array("-r", "corpus_nl", destNl.toString))
      assert(Files.readAllBytes(destNl).sameElements(Files.readAllBytes(srcNl)))
      // dotfile source: dataset name derives from behind the leading dot
      // (a dot-named dataset dir would be hidden from Spark file scans)
      val dot = tmp.resolve(".env")
      Files.write(dot, "K=V\n".getBytes)
      Cli.run(spark, Array("-w", dot.toString))
      val dotBack = tmp.resolve("env_back.txt")
      Cli.run(spark, Array("-r", "env", dotBack.toString))
      assert(new String(Files.readAllBytes(dotBack), "UTF-8") == "K=V\n")
      // identity MR through external commands: multiset of lines preserved
      Cli.run(spark, Array("-mr", "/bin/cat", "/bin/cat", "corpus", "2"))
      val out = MapReduce.read(spark, s"${sys.props("graft.dfs")}/corpus_out")
        .collect()
      assert(out.sorted.sameElements(lines.sorted))
      intercept[IllegalArgumentException] { Cli.run(spark, Array("-x")) }
    } finally sys.props -= "graft.dfs"
  }

  test("WRITE/READ edge cases: single line, and more partitions than lines") {
    val tmp = Files.createTempDirectory("graft-mr-edge").toString
    val one = s"$tmp/one.txt"
    Files.write(Paths.get(one), "only line".getBytes)
    MapReduce.write(spark, one, s"$tmp/dfs1", partitions = 1)
    assert(MapReduce.read(spark, s"$tmp/dfs1").collect().toSeq == Seq("only line"))
    // more chunks than lines: the reference pads empty chunks; here empty
    // partitions are native — content and order must survive regardless
    val few = s"$tmp/few.txt"
    Files.write(Paths.get(few), "b\na\nc".getBytes)
    MapReduce.write(spark, few, s"$tmp/dfs2", partitions = 8)
    assert(MapReduce.read(spark, s"$tmp/dfs2").collect().toSeq == Seq("b", "a", "c"))
  }

  test("golden MR-parity: closure mapReduce == declarative groupBy count") {
    val docs = Tables(spark, sf, "documents").select("text").as[String]
    val viaMr = MapReduce.mapReduce(
      docs,
      line => line.split(" ").iterator.filter(_.nonEmpty).map(w => s"$w,1"),
      (k, vs) => Iterator(s"$k,${vs.size}"),
      numPartitions = 5
    ).collect().map { l => val Array(w, n) = l.split(",", 2); (w, n.toLong) }
      .toMap
    val viaSql = TextOps.wordcountViaSql(spark, sf)
    assert(viaMr == viaSql)
  }

  test("reducer sees values of one key, in lexicographic line order") {
    val input = spark.createDataset(Seq(
      "k1,z", "k1,a", "k2,m", "k1,b", "k3,x", "k2,a"))
    val out = MapReduce.reduceByLineKey(input, 3) { (k, vs) =>
      Iterator(s"$k -> ${vs.mkString("|")}")
    }.collect().sorted
    assert(out.sameElements(Array(
      "k1 -> k1,a|k1,b|k1,z", "k2 -> k2,a|k2,m", "k3 -> k3,x")))
  }

  test("reducer that does not drain its group still frames correctly") {
    val input = spark.createDataset(Seq(
      "k1,a", "k1,b", "k1,c", "k2,x", "k2,y"))
    val out = MapReduce.reduceByLineKey(input, 2) { (k, vs) =>
      Iterator(s"$k,${vs.take(1).next()}")   // reads only first value
    }.collect().sorted
    assert(out.length == 2)
    assert(out(0) == "k1,k1,a" && out(1) == "k2,k2,x")
  }

  test("pipe MR: external python mapper/reducer (YaMR user contract)") {
    val tmp = Files.createTempDirectory("graft-pipe")
    val mapper = tmp.resolve("mapper.py")
    Files.write(mapper,
      """import sys
        |for line in sys.stdin:
        |    for w in line.strip().split(' '):
        |        if w:
        |            print(f"{w},1")
        |""".stripMargin.getBytes)
    val reducer = tmp.resolve("reducer.py")
    Files.write(reducer,
      """import sys
        |prev, n = None, 0
        |for line in sys.stdin:
        |    k = line.rstrip("\n").split(',')[0]
        |    if k != prev:
        |        if prev is not None:
        |            print(f"{prev},{n}")
        |        prev, n = k, 0
        |    n += 1
        |if prev is not None:
        |    print(f"{prev},{n}")
        |""".stripMargin.getBytes)
    val docs = Tables(spark, sf, "documents").select("text").as[String]
    val out = MapReduce.mapReducePipe(docs,
      s"python3 $mapper", s"python3 $reducer", numPartitions = 4)
      .collect().map { l => val Array(w, n) = l.split(",", 2); (w, n.toLong) }
      .toMap
    assert(out == TextOps.wordcountViaSql(spark, sf))
  }
}

object TextOps {
  /** Declarative wordcount collected to a map, shared expected value. */
  def wordcountViaSql(spark: org.apache.spark.sql.SparkSession,
      sf: String): Map[String, Long] =
    graft.queries.TextQueries.wordcount(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
}

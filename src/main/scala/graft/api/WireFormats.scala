package graft.api

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/**
 * Binary wire formats for /render: Python pickle (graphite federation
 * clients) and the carbonapi protobuf fetch-response messages v2/v3
 * (carbonapi-as-backend). Hand-rolled encoders over public specs:
 *
 *  - pickle protocol 2 opcodes (the subset the reference emits — list of
 *    dicts of str/int/float/None/list; ref expr/types/types.go:199-231
 *    MarshalPickle). Byte-for-byte goldens are impossible even against the
 *    reference because Go map iteration order randomizes dict key order, so
 *    we emit a DETERMINISTIC key order; any compliant pickle reader
 *    (graphite-web's pickle.loads) accepts it.
 *  - protobuf wire format for carbonapi_v2_pb / carbonapi_v3_pb
 *    FetchResponse / MultiFetchResponse (ref the .proto schemas under
 *    vendor/github.com/go-graphite/protocol), fields in ascending
 *    field-number order, proto3 zero-value omission, packed repeated
 *    scalars.
 */
object WireFormats {

  // ------------------------------------------------------------- pickle p2

  private object Op {
    val Proto: Array[Byte] = Array(0x80.toByte, 2.toByte)
    val EmptyList = ']'.toByte
    val EmptyDict = '}'.toByte
    val Mark = '('.toByte
    val Appends = 'e'.toByte
    val SetItems = 'u'.toByte
    val None_ = 'N'.toByte
    val BinUnicode = 'X'.toByte
    val BinInt = 'J'.toByte
    val BinInt1 = 'K'.toByte
    val BinFloat = 'G'.toByte
    val Long1 = 0x8a.toByte
    val Stop = '.'.toByte
    val ShortBinString = 'U'.toByte
    val Global = 'c'.toByte
    val Obj = 'o'.toByte
    val Tuple2 = 0x86.toByte
    val Build = 'b'.toByte
    val Append = 'a'.toByte
    val NewTrue = 0x88.toByte
    val NewFalse = 0x89.toByte
  }

  private def pickleString(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    out.write(Op.BinUnicode)
    writeLE32(out, b.length)
    out.write(b)
  }

  private def pickleLong(out: ByteArrayOutputStream, v: Long): Unit =
    if (v >= 0 && v <= 255) { out.write(Op.BinInt1); out.write(v.toInt) }
    else if (v >= Int.MinValue && v <= Int.MaxValue) { out.write(Op.BinInt); writeLE32(out, v.toInt) }
    else {
      // LONG1: little-endian two's-complement, minimal length
      var bytes = List.empty[Byte]
      var x = v
      var done = false
      while (!done) {
        val b = (x & 0xFF).toByte
        bytes = b :: bytes
        x >>= 8
        done = (x == 0 && (b & 0x80) == 0) || (x == -1 && (b & 0x80) != 0)
      }
      val le = bytes.reverse
      out.write(Op.Long1); out.write(le.length)
      le.foreach(out.write(_))
    }

  private def pickleDouble(out: ByteArrayOutputStream, v: Double): Unit = {
    out.write(Op.BinFloat)
    val bits = java.lang.Double.doubleToLongBits(v)
    var i = 7
    while (i >= 0) { out.write(((bits >>> (i * 8)) & 0xFF).toInt); i -= 1 }
  }

  /** graphite pickle payload: list of per-series dicts
    * (ref MarshalPickle, types.go:199-231). */
  def pickle(rows: Seq[RenderedSeries]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Op.Proto)
    out.write(Op.EmptyList)
    out.write(Op.Mark)
    rows.foreach { r =>
      out.write(Op.EmptyDict)
      out.write(Op.Mark)
      def kv(k: String)(writeV: => Unit): Unit = { pickleString(out, k); writeV }
      kv("name")(pickleString(out, r.name))
      kv("pathExpression")(pickleString(out, r.pathExpression))
      kv("consolidationFunc")(pickleString(out, r.tags.getOrElse("consolidateBy", "avg")))
      kv("start")(pickleLong(out, r.start))
      kv("end")(pickleLong(out, r.stop))
      kv("step")(pickleLong(out, r.step))
      kv("xFilesFactor")(pickleDouble(out,
        r.tags.get("xFilesFactor").flatMap(s => s.toDoubleOption).getOrElse(0.0)))
      kv("values") {
        out.write(Op.EmptyList)
        out.write(Op.Mark)
        r.values.foreach(v => if (v.isNaN) out.write(Op.None_) else pickleDouble(out, v))
        out.write(Op.Appends)
      }
      out.write(Op.SetItems)
    }
    out.write(Op.Appends)
    out.write(Op.Stop)
    out.toByteArray
  }

  // ------------------------------------------------- /metrics/find payloads

  /** find format=raw: one path per line, non-leaves end in a dot; `_tag`
    * internals are skipped (ref cmd/carbonapi/http/find_handlers.go:154-174
    * findList). */
  def findList(nodes: Seq[(String, Boolean)]): Array[Byte] = {
    val sb = new StringBuilder
    nodes.foreach { case (path, leaf) =>
      if (!path.startsWith("_tag")) {
        val dot = if (!leaf && !path.endsWith(".")) "." else ""
        sb.append(path).append(dot).append('\n')
      }
    }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  private def shortBin(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    out.write(Op.ShortBinString); out.write(b.length); out.write(b)
  }

  private def pickleGlobal(out: ByteArrayOutputStream, module: String, name: String): Unit = {
    out.write(Op.Global)
    out.write(s"$module\n$name\n".getBytes(StandardCharsets.UTF_8))
  }

  /** One `graphite.intervals.IntervalSet` holding a single Interval
    * [start, end] — the fake "we have everything" interval graphite-web
    * expects in find pickles; all bounds are BINFLOATs like the reference
    * template (ref intervalset/intervalset.go:18-60). */
  private def pickleIntervalSet(out: ByteArrayOutputStream, start: Long, end: Long): Unit = {
    val st = start.toDouble; val en = end.toDouble; val size = (end - start).toDouble
    out.write(Op.Mark); pickleGlobal(out, "graphite.intervals", "IntervalSet"); out.write(Op.Obj)
    out.write(Op.EmptyDict); out.write(Op.Mark)
    shortBin(out, "intervals")
    out.write(Op.EmptyList); out.write(Op.Mark)
    pickleGlobal(out, "graphite.intervals", "Interval"); out.write(Op.Obj)
    out.write(Op.EmptyDict); out.write(Op.Mark)
    shortBin(out, "start"); pickleDouble(out, st)
    shortBin(out, "size"); pickleDouble(out, size)
    shortBin(out, "end"); pickleDouble(out, en)
    shortBin(out, "tuple"); pickleDouble(out, st); pickleDouble(out, en); out.write(Op.Tuple2)
    out.write(Op.SetItems); out.write(Op.Build)
    out.write(Op.Append)
    shortBin(out, "size"); pickleDouble(out, size)
    out.write(Op.SetItems); out.write(Op.Build)
  }

  /** find format=pickle: graphite-web-1.0 list of {path, is_leaf,
    * intervals} dicts, intervals = IntervalSet(0, now+60)
    * (ref find_handlers.go:331-366). */
  def findPickle(nodes: Seq[(String, Boolean)], intervalEnd: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Op.Proto)
    out.write(Op.EmptyList)
    out.write(Op.Mark)
    nodes.foreach { case (path, leaf) =>
      if (!path.startsWith("_tag")) {
        out.write(Op.EmptyDict)
        out.write(Op.Mark)
        pickleString(out, "path"); pickleString(out, path)
        pickleString(out, "is_leaf"); out.write(if (leaf) Op.NewTrue else Op.NewFalse)
        pickleString(out, "intervals"); pickleIntervalSet(out, 0L, intervalEnd)
        out.write(Op.SetItems)
      }
    }
    out.write(Op.Appends)
    out.write(Op.Stop)
    out.toByteArray
  }

  /** GlobResponse{name=1, matches=2:GlobMatch{path=1, isLeaf=2}} — field
    * numbers shared by carbonapi_v2_pb.proto:20-28 and
    * carbonapi_v3_pb.proto:73-82. */
  private def globResponse(name: String, nodes: Seq[(String, Boolean)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    pbString(out, 1, name)
    nodes.foreach { case (path, leaf) =>
      val m = new ByteArrayOutputStream()
      pbString(m, 1, path)
      tag(m, 2, 0); m.write(if (leaf) 1 else 0)
      pbMessage(out, 2, m.toByteArray)
    }
    out.toByteArray
  }

  /** find carbonapi_v2_pb body: a bare GlobResponse
    * (ref find_handlers.go:316-330). */
  def findProtobufV2(name: String, nodes: Seq[(String, Boolean)]): Array[Byte] =
    globResponse(name, nodes)

  /** find carbonapi_v3_pb body: MultiGlobResponse{metrics=1}
    * (ref find_handlers.go:331-333, carbonapi_v3_pb.proto:84-86). */
  def findProtobufV3(name: String, nodes: Seq[(String, Boolean)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    pbMessage(out, 1, globResponse(name, nodes))
    out.toByteArray
  }

  // -------------------------------------------------------------- protobuf

  private def writeLE32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }

  private def varint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write((v & 0x7F).toInt)
  }

  private def tag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    varint(out, (field.toLong << 3) | wire)

  private def pbString(out: ByteArrayOutputStream, field: Int, s: String): Unit =
    if (s.nonEmpty) {
      val b = s.getBytes(StandardCharsets.UTF_8)
      tag(out, field, 2); varint(out, b.length); out.write(b)
    }

  private def pbInt64(out: ByteArrayOutputStream, field: Int, v: Long): Unit =
    if (v != 0) { tag(out, field, 0); varint(out, v) }

  private def pbFloat(out: ByteArrayOutputStream, field: Int, v: Float): Unit =
    if (v != 0f) { tag(out, field, 5); writeLE32(out, java.lang.Float.floatToIntBits(v)) }

  private def pbPackedDoubles(out: ByteArrayOutputStream, field: Int, vs: Array[Double]): Unit =
    if (vs.nonEmpty) {
      tag(out, field, 2); varint(out, vs.length * 8L)
      vs.foreach { v =>
        val bits = java.lang.Double.doubleToLongBits(v)
        var i = 0
        while (i < 8) { out.write(((bits >>> (i * 8)) & 0xFF).toInt); i += 1 }
      }
    }

  private def pbPackedBools(out: ByteArrayOutputStream, field: Int, vs: Array[Boolean]): Unit =
    if (vs.nonEmpty) {
      tag(out, field, 2); varint(out, vs.length.toLong)
      vs.foreach(b => out.write(if (b) 1 else 0))
    }

  private def pbMessage(out: ByteArrayOutputStream, field: Int, body: Array[Byte]): Unit = {
    tag(out, field, 2); varint(out, body.length.toLong); out.write(body)
  }

  /** carbonapi_v3_pb MultiFetchResponse (ref carbonapi_v3_pb.proto:46-64):
    * NaN values travel as raw NaN doubles. */
  def protobufV3(rows: Seq[RenderedSeries]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    rows.foreach { r =>
      val m = new ByteArrayOutputStream()
      pbString(m, 1, r.name)
      pbString(m, 2, r.pathExpression)
      pbString(m, 3, r.tags.getOrElse("consolidateBy", "avg"))
      pbInt64(m, 4, r.start)
      pbInt64(m, 5, r.stop)
      pbInt64(m, 6, r.step)
      pbFloat(m, 7, r.tags.get("xFilesFactor").flatMap(_.toFloatOption).getOrElse(0f))
      pbPackedDoubles(m, 9, r.values)
      pbMessage(out, 1, m.toByteArray)
    }
    out.toByteArray
  }

  /** carbonapi_v2_pb MultiFetchResponse (ref carbonapi_v2_pb.proto:7-18):
    * NaN → value 0 + isAbsent=true (ref MarshalProtobufV2,
    * types.go:233-262). */
  def protobufV2(rows: Seq[RenderedSeries]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    rows.foreach { r =>
      val m = new ByteArrayOutputStream()
      pbString(m, 1, r.name)
      pbInt64(m, 2, r.start)
      pbInt64(m, 3, r.stop)
      pbInt64(m, 4, r.step)
      pbPackedDoubles(m, 5, r.values.map(v => if (v.isNaN) 0.0 else v))
      pbPackedBools(m, 6, r.values.map(_.isNaN))
      pbMessage(out, 1, m.toByteArray)
    }
    out.toByteArray
  }
}

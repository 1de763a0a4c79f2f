package graft.connector // for private[connector] JsonDecode access

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** SURVEY §5.4 property layer: randomized JSON rows survive the
  * connector's projection-aware decode with values preserved, and a
  * pruned decode agrees with the corresponding slice of a full decode. */
object JsonDecodeProps extends Properties("JsonDecode") {

  private val mapper = new ObjectMapper()

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("d", DoubleType),
    StructField("s", StringType),
    StructField("b", BooleanType),
    StructField("arr", ArrayType(LongType)),
    StructField("nested", StructType(Seq(
      StructField("x", LongType), StructField("y", StringType))))))

  private case class Rec(id: Long, d: Double, s: String, b: Boolean,
                         arr: List[Long], x: Long, y: String)

  private val genRec: Gen[Rec] = for {
    id <- Gen.long
    d <- Gen.double.suchThat(v => !v.isNaN) // NaN != NaN would break compare
    s <- Gen.asciiPrintableStr
    b <- Gen.oneOf(true, false)
    arr <- Gen.listOf(Gen.long)
    x <- Gen.long
    y <- Gen.alphaNumStr
  } yield Rec(id, d, s, b, arr, x, y)

  private def toJson(r: Rec): String = {
    val n = mapper.createObjectNode()
    n.put("id", r.id); n.put("d", r.d); n.put("s", r.s); n.put("b", r.b)
    val a = n.putArray("arr"); r.arr.foreach(a.add)
    val nested = n.putObject("nested"); nested.put("x", r.x); nested.put("y", r.y)
    n.toString
  }

  property("round-trip: serialize -> decode preserves every field") =
    forAll(genRec) { r =>
      val row = JsonDecode.toRow(mapper.readTree(toJson(r)), schema)
      val nested = row.getStruct(5, 2)
      Prop.all(
        row.getLong(0) == r.id,
        row.getDouble(1) == r.d,
        row.getUTF8String(2).toString == r.s,
        row.getBoolean(3) == r.b,
        row.getArray(4).toLongArray.toList == r.arr,
        nested.getLong(0) == r.x,
        nested.getUTF8String(1).toString == r.y)
    }

  property("pruned decode equals the slice of a full decode") =
    forAll(genRec, Gen.someOf(schema.fieldNames.toSeq)) { (r, keep) =>
      val pruned = StructType(schema.fields.filter(f => keep.contains(f.name)))
      val node = mapper.readTree(toJson(r))
      val full = JsonDecode.toRow(node, schema)
      val part = JsonDecode.toRow(node, pruned)
      pruned.fields.zipWithIndex.forall { case (f, i) =>
        val j = schema.fieldIndex(f.name)
        String.valueOf(part.get(i, f.dataType)) ==
          String.valueOf(full.get(j, f.dataType))
      }
    }

  property("missing fields decode to null, never throw") =
    forAll(Gen.someOf(schema.fieldNames.toSeq)) { present =>
      val n = mapper.createObjectNode()
      if (present.contains("id")) n.put("id", 1L)
      if (present.contains("s")) n.put("s", "v")
      val row = JsonDecode.toRow(n, schema)
      schema.fieldNames.zipWithIndex.forall { case (name, i) =>
        if (Seq("id", "s").contains(name) && present.contains(name)) !row.isNullAt(i)
        else row.isNullAt(i)
      }
    }
}

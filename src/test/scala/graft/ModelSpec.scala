package graft

import org.scalacheck.{Gen, Prop, Test => ScProp}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.MediaSchema

class ModelSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val result = ScProp.check(ScProp.Parameters.default, p)
    assert(result.passed, result.status.toString)
  }

  test("normalizeFieldName matches the reference transform") {
    assert(MediaSchema.normalizeFieldName("File Format(s)") === "file_formats")
    assert(MediaSchema.normalizeFieldName("Media ID") === "media_id")
    assert(MediaSchema.normalizeFieldName("X Pixel Spacing") === "x_pixel_spacing")
  }

  test("normalizeFieldName is idempotent and never emits spaces/parens") {
    checkProp(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val n = MediaSchema.normalizeFieldName(s)
      MediaSchema.normalizeFieldName(n) == n &&
        !n.contains(' ') && !n.contains('(') && !n.contains(')')
    })
  }

  test("normalizeValue keeps only the first line, trimmed") {
    assert(MediaSchema.normalizeValue("  a value \nsecond line") === "a value")
    assert(MediaSchema.normalizeValue(null) === null)
  }

  test("superset schema contains the contract columns and is duplicate-free") {
    val names = MediaSchema.superset.fieldNames
    assert(MediaSchema.requiredColumns.subsetOf(names.toSet))
    assert(names.distinct.length === names.length)
  }

  test("fieldsForType branches by media type") {
    val vol = MediaSchema.fieldsForType("Volumetric Image Series")
    val mesh = MediaSchema.fieldsForType("Mesh")
    val other = MediaSchema.fieldsForType("Photograph")
    assert(vol.contains("Slice Thickness") && !mesh.contains("Slice Thickness"))
    assert(mesh.contains("Polygons") && !vol.contains("Polygons"))
    assert(other === MediaSchema.baseFields)
  }

  test("validate rejects shards missing contract columns") {
    val spark = TestSpark.session
    import spark.implicits._
    val ok = Seq(("u", 1.0, null: String, 0)).toDF("url", "processing_time", "error", "batch_index")
    val bad = Seq(("u", 1.0)).toDF("url", "processing_time")
    assert(MediaSchema.validate(ok).isRight)
    assert(MediaSchema.validate(bad) === Left(Set("error", "batch_index")))
  }
}

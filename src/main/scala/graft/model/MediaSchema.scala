package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** The media-record data model: a flat, wide record table with fixed
  * metadata columns plus media-type-conditional field columns.
  *
  * Mirrors the reference's dynamic schema
  * (.github/scripts/test_parquet_processor.py:79-130,220-224,303-305) as one
  * pinned superset StructType so shards are union-compatible by
  * construction (SURVEY.md §1.3-1.5). `processed_at` is a typed timestamp
  * (parsed at ingest) instead of the reference's ISO string.
  */
object MediaSchema {

  /** P1: label → column name (lowercase, spaces→_, parens stripped) —
    * reference .github/scripts/test_parquet_processor.py:255,258.
    */
  def normalizeFieldName(label: String): String =
    label.toLowerCase.replace(" ", "_").replace("(", "").replace(")", "")

  /** P2: values keep only the first line, trimmed —
    * reference .github/scripts/test_parquet_processor.py:254.
    */
  def normalizeValue(raw: String): String =
    Option(raw).map(_.strip.split('\n').head.strip).orNull

  // Field sections, by original label (test_parquet_processor.py:82-127).
  val generalDetails: Seq[String] = Seq(
    "Media ID", "Media Type", "Object Element or Part", "Object Represented",
    "Object Taxonomy", "Object Organization", "Side", "Orientation",
    "Short Description", "Full Description", "Creator", "Date Created",
    "Date Uploaded")

  val ownershipPermissions: Seq[String] = Seq(
    "Data Managed By", "Data Uploaded By", "Publication Status",
    "Download Reviewer", "IP Holder", "Copyright Statement",
    "Creative Commons License", "MorphoSource Use Agreement Type",
    "Permits Commercial Use", "Permits 3D Use",
    "Required Archival of Published Derivatives", "Funding Attribution",
    "Publisher", "Cite As", "Media Preview Mode",
    "Additional Usage Agreement")

  val identifiersExternal: Seq[String] = Seq(
    "MorphoSource ARK", "MorphoSource DOI", "External Identifier",
    "External Media URL")

  /** Volumetric Image Series adds CT-scan voxel metadata + acquisition. */
  val volumetricFields: Seq[String] = Seq(
    "File Name", "File Format(s)", "File Size", "Image Width", "Image Height",
    "Color Space", "Color Depth", "Compression", "X Pixel Spacing",
    "Y Pixel Spacing", "Z Pixel Spacing", "Pixel Spacing Units",
    "Slice Thickness", "Number of Images in Set", "Number of Parent Media",
    "Number of Processing Events", "Modality", "Device")

  /** Mesh adds geometry metadata + acquisition. */
  val meshFields: Seq[String] = Seq(
    "File Name", "File Format(s)", "File Size", "Points", "Polygons",
    "Map Type", "UV Coordinates", "Vertex Color", "Bounding Box Dimensions",
    "Centroid Coordinates", "Units of Point Coordinates",
    "Number of Parent Media", "Number of Processing Events",
    "Derived Directly From", "Modality", "Device")

  val baseFields: Seq[String] =
    generalDetails ++ ownershipPermissions ++ identifiersExternal

  /** P5: media type → the field sections extracted for it —
    * reference test_parquet_processor.py:103-128.
    */
  def fieldsForType(mediaType: String): Seq[String] = mediaType match {
    case "Volumetric Image Series" => baseFields ++ volumetricFields
    case "Mesh"                    => baseFields ++ meshFields
    case _                         => baseFields
  }

  /** All scraped data columns (normalized, deduplicated, order-stable). */
  val dataColumns: Seq[String] =
    (baseFields ++ volumetricFields ++ meshFields)
      .map(normalizeFieldName).distinct

  /** Fixed metadata columns (test_parquet_processor.py:220-224,303-305). */
  val metadataFields: Seq[StructField] = Seq(
    StructField("url", StringType, nullable = false),
    StructField("processed_at", TimestampType, nullable = true),
    StructField("error", StringType, nullable = true),
    // LongType: the reference writes it from a pandas int (int64 in
    // parquet, test_parquet_processor.py:303), and an Int here overflowed
    // wrapped-negative past 2^31 records on the 100 TB list
    StructField("batch_index", LongType, nullable = true),
    StructField("attempt", IntegerType, nullable = true),
    StructField("processing_time", DoubleType, nullable = true))

  /** The pinned superset schema: metadata + every possible data column. */
  val superset: StructType = StructType(
    metadataFields ++ dataColumns.map(StructField(_, StringType, nullable = true)))

  /** P6: the read contract — reference evaluate_test_run.py:24-29. */
  val requiredColumns: Set[String] =
    Set("url", "processing_time", "error", "batch_index")

  /** Validate a shard against the read contract; Left(missing) on failure
    * (invalid shards are excluded, not fatal — evaluate_test_run.py:60-67).
    */
  def validate(df: DataFrame): Either[Set[String], DataFrame] = {
    val missing = requiredColumns -- df.columns.toSet
    if (missing.isEmpty) Right(df) else Left(missing)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import graft.sources.{ConeSource, FtirSource, HfmSource, LabTable, MccSource, NgbSource, StaSource}

/** Public ingest API, mirroring the reference's entry points
  * (SURVEY.md §0: each `path → table-with-metadata`). Formats land as
  * [[graft.sources.LabTable]] — a DataFrame with per-column unit
  * metadata plus table-level file_metadata/type JSON. */
object LabEtl {

  /** Netzsch STA text export (netzsch_sta_parser.py:30). */
  def loadStaData(spark: SparkSession, path: String): LabTable =
    StaSource.load(spark, path)

  /** FAA Micro Combustion Calorimeter text (faa_mcc_parser.py:12). */
  def loadMccData(spark: SparkSession, path: String): LabTable =
    MccSource.load(spark, path)

  /** TA/Waters Heat Flow Meter report (fox_hfm_parser.py:12). */
  def loadHfmData(spark: SparkSession, path: String): LabTable =
    HfmSource.load(spark, path)

  /** Deatak cone calorimeter XLSM workbook (deatak_cone_parser.py:10). */
  def loadConeData(spark: SparkSession, path: String): LabTable =
    ConeSource.load(spark, path)

  /** Netzsch STA proprietary binary (netzsch_sta_ngb_parser.py:37). */
  def loadNgbData(spark: SparkSession, path: String): LabTable =
    NgbSource.load(spark, path)

  /** Bruker OPUS FTIR binary (bruker_ftir_parser.py:12). */
  def loadFtirData(spark: SparkSession, path: String): LabTable =
    FtirSource.load(spark, path)
}

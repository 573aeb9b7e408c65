package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 64-bit graph id = 16-bit label id ‖ 48-bit local id, mirroring the
  * reference's Graphid layout (/root/reference/src/types/graphid.rs:15-46).
  * Implemented as plain Column arithmetic over LongType — no custom Catalyst
  * type is needed; codegen'd bit ops keep this inside whole-stage codegen.
  */
object Graphid {
  val LabelBits = 16
  val LocalBits = 48
  val LocalMask: Long = (1L << LocalBits) - 1
  val MaxLabel: Int = (1 << LabelBits) - 1

  def pack(labid: Int, locid: Long): Long = {
    require(labid >= 0 && labid <= MaxLabel, s"label id out of range: $labid")
    (labid.toLong << LocalBits) | (locid & LocalMask)
  }

  /** Column form: pack a label id constant with a local-id column. */
  def packCol(labid: Int, locid: Column): Column =
    lit(labid.toLong << LocalBits).bitwiseOR(locid.cast("long").bitwiseAND(lit(LocalMask)))

  // logical shift: labels >= 32768 set the sign bit, and an arithmetic
  // shiftright would sign-extend them to negative label ids
  def labidCol(id: Column): Column = shiftrightunsigned(id, LocalBits).cast("int")
  def locidCol(id: Column): Column = id.bitwiseAND(lit(LocalMask))

  def unpack(id: Long): (Int, Long) = ((id >>> LocalBits).toInt, id & LocalMask)
}

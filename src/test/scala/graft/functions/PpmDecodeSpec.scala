package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expr.HashOps

/** Byte-level edge cases for the real PPM parser behind m06. */
class PpmDecodeSpec extends AnyFunSuite {

  private def img(header: String, pixels: Array[Byte]): Array[Byte] =
    header.getBytes("UTF-8") ++ pixels

  private def decode(bytes: Array[Byte]): InternalRow = HashOps.ppmDecode(bytes)

  test("a well-formed 2x1 image decodes to exact channel means") {
    val r = decode(img("P6\n2 1\n255\n", Array[Byte](10, 20, 30, 40, 60, -1)))
    assert(r != null)
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == (2, 1, 255))
    assert(r.getDouble(3) == 25.0) // (10+40)/2
    assert(r.getDouble(4) == 40.0) // (20+60)/2
    assert(r.getDouble(5) == (30 + 255) / 2.0) // -1 reads as unsigned 0xff
  }

  test("header whitespace may be any mix of space/tab/newline runs") {
    val r = decode(img("P6  2\t1\r\n255 ", Array[Byte](1, 2, 3, 4, 5, 6)))
    assert(r != null && r.getInt(0) == 2 && r.getInt(1) == 1)
  }

  test("malformed payloads quarantine as null") {
    val px = Array[Byte](1, 2, 3, 4, 5, 6)
    assert(decode(img("Q6\n2 1\n255\n", px)) == null, "wrong magic")
    assert(decode(img("P6\n2 1\n255\n", px.dropRight(1))) == null, "truncated pixels")
    assert(decode(img("P6\n2 1\n255\n", px :+ 9.toByte)) == null, "trailing bytes")
    assert(decode(img("P6\n2 1\n999\n", px)) == null, "maxval beyond 8-bit")
    assert(decode(img("P6\n0 1\n255\n", Array.empty[Byte])) == null, "zero width")
    assert(decode(img("P6\n2 1\n255", px)) == null, "missing post-maxval whitespace")
    assert(decode(img("P6\n2 x\n255\n", px)) == null, "non-numeric height")
    assert(decode(Array[Byte]('P', '6')) == null, "header only")
    assert(decode(null) == null, "null payload")
  }
}

package graft.types

/** The Python-side VALUE conversion (python/cocoindex/convert.py
  * `encode_engine_value` + the `make_engine_value_decoder` error
  * vocabulary) — wave-4 parity against fixtures recorded from the
  * reference module under CPython
  * (tools/gen_parity_fixtures4.py → refparity/py_value_conversion
  * .json).
  *
  * Encode (Python value → engine boundary):
  *  - scalars, None, bytes, uuids, temporals, numpy arrays and numpy
  *    scalars PASS THROUGH (pyo3 converts them at the boundary; the
  *    fixture canonicalizes them to tagged JSON and the twin's value
  *    tree uses the same canonical forms);
  *  - dataclasses/NamedTuples flatten to POSITIONAL field lists
  *    (None defaults included);
  *  - lists encode element-wise (an LTable is just a list of
  *    positional rows);
  *  - dicts become KTable row lists with the encoded key PREPENDED —
  *    a tuple key prepends as a single nested list element.
  *
  * Decoder errors carry joined field paths (`$root`, `$root[*]`,
  * `.field`) and the reference's exact phrasing per arm.
  */
object PyValueConversion {

  /** A Python value in the fixture's canonical form. */
  sealed trait PyVal
  final case class VInt(v: Long) extends PyVal
  final case class VFloat(v: Double) extends PyVal
  final case class VStr(v: String) extends PyVal
  final case class VBool(v: Boolean) extends PyVal
  case object VNone extends PyVal
  final case class VBytes(v: Seq[Int]) extends PyVal
  /** uuid/date/time/datetime/timedelta: str() form + python type
    * name, passed through the boundary untouched. */
  final case class VTagged(str: String, pyType: String) extends PyVal
  final case class VNdArray(values: Seq[Double], dtype: String)
      extends PyVal
  final case class VTuple(items: Seq[PyVal]) extends PyVal
  final case class VList(items: Seq[PyVal]) extends PyVal
  final case class VDict(entries: Seq[(PyVal, PyVal)]) extends PyVal
  /** dataclass / NamedTuple instance: field values in declaration
    * order. */
  final case class VStruct(fields: Seq[PyVal]) extends PyVal

  /** encode_engine_value (convert.py): returns the engine-boundary
    * value in the same canonical tree. Sharpened by review r14 pass 4
    * (each arm verified against the module under CPython):
    *  - tuples encode as LISTS (`isinstance(value, (list, tuple))`);
    *  - only a dict whose values are STRUCTS flattens to KTable rows
    *    (key prepended, a tuple key as one nested list element) — a
    *    plain dict, including the empty dict, passes through with
    *    encoded values. */
  def encode(v: PyVal): PyVal = v match {
    case VStruct(fields) => VList(fields.map(encode))
    case VList(items) => VList(items.map(encode))
    case VTuple(items) => VList(items.map(encode))
    case VDict(entries) =>
      val structValued =
        entries.headOption.exists(_._2.isInstanceOf[VStruct])
      if (structValued)
        VList(entries.map { case (k, value) =>
          val row = encode(value) match {
            case VList(fields) => fields
            case scalar => Seq(scalar)
          }
          VList(encode(k) +: row)
        })
      else VDict(entries.map { case (k, value) =>
        encode(k) -> encode(value)
      })
    case passthrough => passthrough
  }

  // ----------------------------------------------------------------
  // Decoder error vocabulary (convert.py make_engine_value_decoder)
  // ----------------------------------------------------------------

  /** convert.py:140-142 (and :225-227): a non-list source for a
    * declared list/LTable slot. `coreRepr` is Python's repr of the
    * declared type. */
  def listTypeExpected(fieldPath: String, coreRepr: String): String =
    s"Type mismatch for `$fieldPath`: declared `$coreRepr`, " +
      "a list type expected"

  /** convert.py:162-164. */
  def dictTypeExpected(fieldPath: String, coreRepr: String): String =
    s"Type mismatch for `$fieldPath`: declared `$coreRepr`, " +
      "a dict type expected"

  /** The struct arm's mismatch (a Struct source decoding into a
    * non-struct annotation). */
  def structExpected(fieldPath: String, coreRepr: String): String =
    s"Type mismatch for `$fieldPath`: declared `$coreRepr`, " +
      "a dataclass, NamedTuple or dict[str, Any] expected"

  /** convert.py:253-254. */
  def nullNonNullVector(fieldPath: String): String =
    s"Received null for non-nullable vector `$fieldPath`"

  /** convert.py:261-263. */
  def vectorDimMismatch(fieldPath: String, expected: Int,
      got: Int): String =
    s"Vector dimension mismatch for `$fieldPath`: " +
      s"expected $expected, got $got"

  /** Field paths join bare: `$root` + `[*]` + `.name`. */
  def childPath(parent: String, segment: String): String =
    parent + segment

  // ----------------------------------------------------------------
  // Decode faces (the success arms of make_engine_value_decoder)
  // ----------------------------------------------------------------

  /** A positional engine row decodes into the dataclass's named
    * fields (declaration order). */
  def decodeStructRow(values: Seq[PyVal],
      names: Seq[String]): Seq[(String, PyVal)] =
    names.zip(values)

  /** An LTable decodes row-wise, order kept. */
  def decodeLTable(rows: Seq[Seq[PyVal]],
      names: Seq[String]): Seq[Seq[(String, PyVal)]] =
    rows.map(decodeStructRow(_, names))

  /** A KTable decodes into a dict: key first, remaining cells the
    * named row (a python dict — no re-sorting on decode; the fixture
    * sorts only for stable JSON). */
  def decodeKTable(rows: Seq[Seq[PyVal]], names: Seq[String])
      : Seq[(PyVal, Seq[(String, PyVal)])] =
    rows.map(r => r.head -> decodeStructRow(r.tail, names))

  /** A vector decodes to an ndarray of the element dtype. */
  def decodeVector(values: Seq[Double], dtype: String): PyVal =
    VNdArray(values, dtype)
}

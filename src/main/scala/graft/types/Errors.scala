package graft.types

/** Typed error signals, mirroring the reference's signal hierarchy
  * (reference: preql/core/pql_types.py:295-323 — Exception subtypes
  * TypeError/ValueError/CastError/NotImplementedError etc. raised as
  * first-class signals). In the Scala engine these are host-language
  * exceptions; query-level errors (e.g. strict casts) surface as
  * Spark job failures wrapping these messages.
  */
sealed abstract class GraftError(msg: String) extends RuntimeException(msg)

/** Wrong row multiplicity: `one` on 0 or 2+ rows. */
final class ValueError(msg: String) extends GraftError(msg)

/** Type mismatch at plan-build time (projection dup, bad operand). */
final class TypeError(msg: String) extends GraftError(msg)

/** Cast failure semantics (strict string→int at runtime raises inside
  * the job; this type is for driver-side cast checks).
  */
final class CastError(msg: String) extends GraftError(msg)

/** Name resolution failure (unknown table/column in catalog). */
final class NameError(msg: String) extends GraftError(msg)

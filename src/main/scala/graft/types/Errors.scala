package graft.types

/** Typed error signals, mirroring the reference's signal TREE
  * (reference: preql/core/pql_types.py:295-323) so callers can catch
  * by supertype, exactly like the reference's `try/catch(SuperType)`:
  *
  *   GraftError (= T.Exception)
  *   ├── CodeError            — inherently unexecutable code
  *   │   ├── SyntaxError-like (lang.ParseError extends separately)
  *   │   └── NotImplementedError
  *   ├── IOError
  *   │   └── FileError
  *   └── EvalError            — arises only when evaluating
  *       ├── TypeError ── CastError
  *       ├── ValueError ── AssertError, IndexError
  *       ├── NameError ── AttributeError
  *       └── JoinError
  *
  * In the Scala engine these are host-language exceptions; query-level
  * errors (e.g. strict casts) surface as Spark job failures wrapping
  * these messages.
  */
sealed abstract class GraftError(msg: String) extends RuntimeException(msg)

/** A user-thrown generic signal: `throw new Exception("...")` in the
  * language constructs an instance of the ROOT type (reference
  * T.Exception, tests/test_basic.py test_transaction1) — caught only
  * by `catch(Exception)`, never by any subtype pattern.
  */
final class UserError(msg: String) extends GraftError(msg)

/** Failures due to inherently unexecutable code (T.CodeError). */
sealed abstract class CodeError(msg: String) extends GraftError(msg)
final class NotImplementedError(msg: String) extends CodeError(msg)

/** Errors from I/O communication (T.IOError). */
sealed abstract class IOError(msg: String) extends GraftError(msg)
final class FileError(msg: String) extends IOError(msg)

/** Errors that arise only when evaluating code (T.EvalError). */
sealed abstract class EvalError(msg: String) extends GraftError(msg)

/** Wrong row multiplicity (`one` on 0 or 2+ rows), bad values. */
class ValueError(msg: String) extends EvalError(msg)
final class AssertError(msg: String) extends ValueError(msg)
final class IndexError(msg: String) extends ValueError(msg)

/** Type mismatch at plan-build time (projection dup, bad operand). */
class TypeError(msg: String) extends EvalError(msg)

/** Cast failure semantics (strict string→int at runtime raises inside
  * the job; this type is for driver-side cast checks).
  */
final class CastError(msg: String) extends TypeError(msg)

/** Name resolution failure (unknown table/column in catalog). */
class NameError(msg: String) extends EvalError(msg)
final class AttributeError(msg: String) extends NameError(msg)

/** Join resolution failure (no FK path, ambiguous sides). */
final class JoinError(msg: String) extends EvalError(msg)

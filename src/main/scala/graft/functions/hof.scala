package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Let-binding for higher-order-function expressions.
  *
  * Catalyst evaluates HOF lambdas interpretively and does NOT hoist or
  * common-subexpression-eliminate a non-lambda subtree referenced from a
  * lambda body: `transform(idx, i => f(heavy, i))` recomputes `heavy` once
  * PER ELEMENT. For a windowed pass over an n-element array that turns an
  * O(n) plan into O(n²) — measured 30× on the winnowing fingerprint at
  * sf0.1.
  *
  * `bind(heavy)(h => body)` evaluates `heavy` exactly once by making it the
  * single element of a literal-shaped array and re-entering the body with
  * the lambda VARIABLE `h` (lambda variables are plain slot reads).
  */
object hof {
  def bind(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)
}

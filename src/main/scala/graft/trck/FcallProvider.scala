package graft.trck

/** User-fcall registration surface for the CLI — the Spark-world analog of
  * the reference compiling a sibling `.tr.c` next to the program and
  * linking its functions into the matcher (reference: bin/trck:55-130;
  * test/tr/test_ffi.tr.c). A JVM can't compile-and-link C at submit time;
  * the equivalent contract is a class on the job's classpath implementing
  * this trait, named via `Trck --fcall-class <fqcn>` (a plain class with a
  * zero-arg constructor, or a Scala `object` — both resolve).
  *
  * The returned module's functions execute inside executor tasks, so every
  * closure must be serializable (plain Scala lambdas are); the
  * initialize/finalize hooks run once on the driver around the query, as
  * the reference's main-scope calls do (src/match_traildb.c:1248,1256).
  */
trait FcallProvider {
  def module: Fsm.FcallModule
}

object FcallProvider {

  /** Resolve `fqcn` to its [[Fsm.FcallModule]]: try a Scala `object`
    * (companion MODULE$ of `fqcn` or `fqcn$`) first, then a zero-arg
    * class. The instance must implement [[FcallProvider]] (or itself BE a
    * module). Fails loudly with the class name on every mismatch — a CLI
    * typo must not silently run without the user's functions.
    */
  def load(fqcn: String): Fsm.FcallModule = {
    def classOf(name: String): Option[Class[_]] =
      try Some(Class.forName(name)) catch { case _: ClassNotFoundException => None }
    def singleton(cls: Class[_]): Option[Any] =
      try Some(cls.getField("MODULE$").get(null)) // Scala object
      catch { case _: NoSuchFieldException => None }
    // a Scala `object Foo` compiles to Foo$ (the singleton) plus a
    // constructor-less forwarder class Foo — try the singleton shapes
    // before the zero-arg-constructor shape, under either spelling
    val inst = classOf(fqcn + "$").flatMap(singleton)
      .orElse(classOf(fqcn).flatMap(singleton))
      .orElse(classOf(fqcn).map { c =>
        try c.getDeclaredConstructor().newInstance()
        catch {
          case _: NoSuchMethodException =>
            throw new IllegalArgumentException(
              s"--fcall-class $fqcn: neither a Scala object nor a class " +
                "with a zero-arg constructor")
        }
      })
      .getOrElse(throw new IllegalArgumentException(
        s"--fcall-class $fqcn: class not found (nor ${fqcn}$$)"))
    inst match {
      case p: FcallProvider   => p.module
      case m: Fsm.FcallModule => m
      case other =>
        throw new IllegalArgumentException(
          s"--fcall-class $fqcn resolves to ${other.getClass.getName}, " +
            "which implements neither graft.trck.FcallProvider nor Fsm.FcallModule")
    }
  }
}

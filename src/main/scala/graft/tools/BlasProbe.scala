package graft.tools

/** Diagnostic: which dev.ludovic.netlib BLAS/LAPACK/ARPACK
  * implementation actually loads in this runtime, and why the faster
  * tiers fail when they do (ls08's solver rides these through MLlib).
  */
object BlasProbe {
  def main(args: Array[String]): Unit = {
    def tryLoad(name: String, load: () => AnyRef): Unit =
      try println(s"$name -> ${load().getClass.getName}")
      catch { case e: Throwable =>
        println(s"$name FAILED: ${e}")
        var c = e.getCause
        while (c != null) { println(s"  cause: $c"); c = c.getCause }
      }
    println(s"java: ${System.getProperty("java.version")} " +
      s"spec ${System.getProperty("java.specification.version")}")
    tryLoad("VectorBLAS",
      () => Class.forName("dev.ludovic.netlib.blas.VectorBLAS")
        .getMethod("getInstance").invoke(null))
    tryLoad("JNIBLAS",
      () => Class.forName("dev.ludovic.netlib.blas.JNIBLAS")
        .getMethod("getInstance").invoke(null))
    tryLoad("BLAS.getInstance",
      () => dev.ludovic.netlib.blas.BLAS.getInstance())
    tryLoad("LAPACK.getInstance",
      () => dev.ludovic.netlib.lapack.LAPACK.getInstance())
    tryLoad("ARPACK.getInstance",
      () => dev.ludovic.netlib.arpack.ARPACK.getInstance())
  }
}

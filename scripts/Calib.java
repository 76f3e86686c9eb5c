// Fixed-work CPU calibration probe, identical arithmetic to
// graft.Bench.calibrate (SplitMix64 mixed 2e8 steps, single thread):
// prints wall ms. Run before each A/B leg to anchor host speed.
public class Calib {
  public static void main(String[] a) {
    long x = 1L, acc = 0L;
    long t0 = System.nanoTime();
    for (long i = 0; i < 200000000L; i++) {
      x += 0x9e3779b97f4a7c15L;
      long z = x;
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L;
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL;
      acc ^= z ^ (z >>> 31);
    }
    if (acc == 42) System.err.print("");
    System.out.println(Math.round((System.nanoTime() - t0) / 1e5) / 10.0);
  }
}

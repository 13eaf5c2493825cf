package aprilasr;

import static org.junit.Assert.assertTrue;
import static org.junit.Assume.assumeFalse;

import java.util.ArrayList;
import java.util.List;
import java.util.concurrent.CountDownLatch;
import java.util.concurrent.TimeUnit;

import org.junit.Test;

/**
 * End-to-end smoke test against a live april-serve (counterpart of the
 * reference's LibraryTest, reference:
 * bindings/java/lib/lib/src/test/java/aprilasr/LibraryTest.java:118-176).
 *
 * Requires -Dapril.endpoint=host:port (wired from APRIL_SERVE_ENDPOINT by
 * build.gradle) and libaprilasr_tpu.so on jna.library.path; the test skips
 * itself when no endpoint is configured so `gradle test` stays green in
 * plain checkouts.
 */
public class SmokeTest {
    @Test
    public void streamsToneAndReceivesResults() throws Exception {
        String endpoint = System.getProperty("april.endpoint", "");
        assumeFalse("APRIL_SERVE_ENDPOINT not set; skipping live smoke",
                endpoint.isEmpty());

        final List<Integer> kinds = new ArrayList<>();
        final CountDownLatch got = new CountDownLatch(1);
        CallbackHandler handler = new CallbackHandler() {
            @Override
            public void onPartialResult(Token[] tokens) {
                synchronized (kinds) { kinds.add(1); }
                got.countDown();
            }

            @Override
            public void onFinalResult(Token[] tokens) {
                synchronized (kinds) { kinds.add(2); }
                got.countDown();
            }

            @Override
            public void onSilence() {
                synchronized (kinds) { kinds.add(4); }
                got.countDown();
            }

            @Override
            public void onErrorCantKeepUp() {
                synchronized (kinds) { kinds.add(3); }
            }
        };

        try (Model model = new Model(endpoint)) {
            assertTrue(model.getSampleRate() > 0);
            try (Session session = new Session(model, handler)) {
                // 1 s of mixed tone + noise: random-weight fixture models
                // emit on this, real models at minimum hit the flush path
                short[] chunk = new short[3200];
                java.util.Random rng = new java.util.Random(7);
                for (int c = 0; c < 5; c++) {
                    for (int i = 0; i < chunk.length; i++) {
                        double t = (c * 3200 + i) / 16000.0;
                        chunk[i] = (short) (8000 * Math.sin(2 * Math.PI * 440 * t)
                                + rng.nextInt(4000) - 2000);
                    }
                    session.feedPcm16(chunk);
                }
                session.flush();
                assertTrue("no callback within 120 s",
                        got.await(120, TimeUnit.SECONDS));
            }
        }
        synchronized (kinds) {
            assertTrue("no results received", !kinds.isEmpty());
        }
    }
}

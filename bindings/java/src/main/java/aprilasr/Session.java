package aprilasr;

import com.sun.jna.Pointer;

import java.nio.charset.StandardCharsets;
import java.security.MessageDigest;

/** A streaming recognition session.
 *
 * Same surface as the reference Java binding's Session (reference:
 * bindings/java/lib/lib/src/main/java/aprilasr/Session.java). All sessions
 * behave like the reference's async modes: results arrive on a background
 * reader thread owned by the native client library. */
public final class Session implements AutoCloseable {
    private Pointer handle;
    // Strong reference: JNA must not GC the callback while native code holds it.
    private final AprilTpuLibrary.ResultHandler nativeHandler;

    public Session(Model model, CallbackHandler handler) {
        this(model, handler, true, false, "");
    }

    public Session(Model model, CallbackHandler handler, boolean asynchronous,
                   boolean noRt, String speakerName) {
        if (handler == null) {
            throw new IllegalArgumentException("handler must not be null");
        }

        nativeHandler = (userdata, resultType, count, tokensPtr) -> {
            Token[] tokens = unmarshalTokens(count, tokensPtr);
            switch (resultType) {
                case AprilTpuLibrary.APRIL_RESULT_RECOGNITION_PARTIAL:
                    handler.onPartialResult(tokens);
                    break;
                case AprilTpuLibrary.APRIL_RESULT_RECOGNITION_FINAL:
                    handler.onFinalResult(tokens);
                    break;
                case AprilTpuLibrary.APRIL_RESULT_SILENCE:
                    handler.onSilence();
                    break;
                case AprilTpuLibrary.APRIL_RESULT_ERROR_CANT_KEEP_UP:
                    handler.onErrorCantKeepUp();
                    break;
                default:
                    break;
            }
        };

        AprilTpuLibrary.NativeConfig.ByValue config =
                new AprilTpuLibrary.NativeConfig.ByValue();
        config.handler = nativeHandler;
        config.userdata = null;
        config.flags = asynchronous
                ? (noRt ? AprilTpuLibrary.APRIL_CONFIG_FLAG_ASYNC_NO_RT_BIT
                        : AprilTpuLibrary.APRIL_CONFIG_FLAG_ASYNC_RT_BIT)
                : 0;
        config.speaker = speakerId(speakerName);

        handle = AprilTpuLibrary.INSTANCE.aas_create_session(
                model.handle, config);
        if (handle == null) {
            throw new IllegalStateException("failed to create session");
        }
    }

    private static byte[] speakerId(String name) {
        byte[] id = new byte[16];
        if (name != null && !name.isEmpty()) {
            try {
                byte[] digest = MessageDigest.getInstance("SHA-256")
                        .digest(name.getBytes(StandardCharsets.UTF_8));
                System.arraycopy(digest, 0, id, 0, 16);
            } catch (Exception ignored) {
                // no digest available: leave the all-zero (anonymous) id
            }
        }
        return id;
    }

    private static Token[] unmarshalTokens(long count, Pointer tokensPtr) {
        int n = (int) count;
        Token[] out = new Token[n];
        if (n == 0 || tokensPtr == null) {
            return out;
        }
        AprilTpuLibrary.NativeToken first =
                new AprilTpuLibrary.NativeToken(tokensPtr);
        int stride = first.size();
        for (int i = 0; i < n; i++) {
            AprilTpuLibrary.NativeToken nt = new AprilTpuLibrary.NativeToken(
                    tokensPtr.share((long) i * stride));
            String text = nt.token == null
                    ? "" : nt.token.getString(0, "UTF-8");
            out[i] = new Token(text, nt.logprob, nt.flags, nt.timeMs);
        }
        return out;
    }

    /** Feed 16-bit mono PCM samples at the model sample rate. */
    public void feedPcm16(short[] samples) {
        AprilTpuLibrary.INSTANCE.aas_feed_pcm16(
                handle, samples, samples.length);
    }

    /** Process remaining audio and force a FINAL result. */
    public void flush() {
        AprilTpuLibrary.INSTANCE.aas_flush(handle);
    }

    /** Realtime speedup factor (always 1.0 in this client). */
    public float getRealtimeSpeedup() {
        return AprilTpuLibrary.INSTANCE.aas_realtime_get_speedup(handle);
    }

    @Override
    public synchronized void close() {
        if (handle != null) {
            AprilTpuLibrary.INSTANCE.aas_free(handle);
            handle = null;
        }
    }
}

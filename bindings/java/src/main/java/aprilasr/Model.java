package aprilasr;

import com.sun.jna.Pointer;

/** Connection to an april-serve model endpoint.
 *
 * Same surface as the reference Java binding's Model (reference:
 * bindings/java/lib/lib/src/main/java/aprilasr/Model.java), except the
 * constructor takes a "host:port" endpoint instead of a .april path —
 * inference runs server-side on TPU. */
public final class Model implements AutoCloseable {
    private static boolean initialized = false;

    Pointer handle;

    public Model(String endpoint) {
        synchronized (Model.class) {
            if (!initialized) {
                AprilTpuLibrary.INSTANCE.aam_api_init(
                        AprilTpuLibrary.APRIL_VERSION);
                initialized = true;
            }
        }
        handle = AprilTpuLibrary.INSTANCE.aam_create_model(endpoint);
        if (handle == null) {
            throw new IllegalArgumentException(
                    "failed to connect to april-serve at " + endpoint);
        }
    }

    public String getName() {
        return AprilTpuLibrary.INSTANCE.aam_get_name(handle);
    }

    public String getDescription() {
        return AprilTpuLibrary.INSTANCE.aam_get_description(handle);
    }

    public String getLanguage() {
        return AprilTpuLibrary.INSTANCE.aam_get_language(handle);
    }

    public long getSampleRate() {
        return AprilTpuLibrary.INSTANCE.aam_get_sample_rate(handle);
    }

    @Override
    public synchronized void close() {
        if (handle != null) {
            AprilTpuLibrary.INSTANCE.aam_free(handle);
            handle = null;
        }
    }
}

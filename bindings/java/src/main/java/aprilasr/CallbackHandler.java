package aprilasr;

/** Recognition result callbacks, delivered on the session's reader thread.
 *
 * Mirrors the reference Java binding's CallbackHandler interface (reference:
 * bindings/java/lib/lib/src/main/java/aprilasr/Session.java:45-51). */
public interface CallbackHandler {
    /** Tokens recognized so far in the live window; superseded by the next
     * call. */
    void onPartialResult(Token[] tokens);

    /** The utterance was finalized; the token window restarts. */
    void onFinalResult(Token[] tokens);

    /** Prolonged silence (>= 2.2 s without emission); context was reset. */
    default void onSilence() {}

    /** Audio was dropped because the pipeline cannot keep up. */
    default void onErrorCantKeepUp() {}
}
